package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §7.11 "100 TB hardening").
  *
  * AQE's skew-join splitting covers most cases at runtime; these
  * operators are the explicit, plan-level form for when the skew is
  * known up front (power-law group keys — exactly the shape of
  * wordcount/shingle/LSH-bucket shuffles in the LLM pipeline).
  */
object SkewOps {

  /** Deterministic row salt in [0, salts): hash of the whole row, so
    * re-runs produce identical partials. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.toSeq.map(col): _*)), lit(salts.toLong))

  /** Two-phase salted sum/count: phase 1 aggregates on (key, salt) —
    * a hot key spreads over `salts` reducers — phase 2 merges the
    * partials per key. Only for algebraic aggregates; feed decimal
    * columns if exact results matter (double re-association changes
    * with salting). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(col(valueCol)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as(s"count_$valueCol"))
  }

  /** Salted join for a skewed equi-key: the big side gets a random-ish
    * but deterministic salt; the small side is replicated `salts`
    * times (explode), so each hot-key partition meets a copy. Row
    * multiplicity is preserved exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt", rowSalt(big, salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}

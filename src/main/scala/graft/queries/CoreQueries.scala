package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for query modules. */
object Q {
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  /** Round a double-valued scalar for hash-stable oracle compare. */
  def r(c: Column, scale: Int = 4): Column = round(c, scale)

  /** Exact arithmetic strategy for the oracle (ADVICE r1): the source
    * money/rate columns are true 2-decimal values stored as doubles, so
    * casting THEM to DECIMAL(12,2) recovers the exact value identically
    * in Spark and DuckDB (the 1e-17 binary error is far from any .xx5
    * rounding boundary). All products/sums then happen exactly in decimal
    * — parallel order can't change them — and the final cast back to
    * double is exact while the unscaled value stays below 2^53.
    *
    * Casting a derived double expression to decimal instead is NOT safe:
    * Spark rounds the shortest decimal representation (BigDecimal.valueOf)
    * while DuckDB rounds the exact binary value, and 6-decimal products
    * hit .xxxx5 ties constantly.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact sum of a 2-decimal-valued double column, as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact-decimal-backed mean: identical IEEE double division of an
    * exactly-cast decimal sum by a count on both engines — bit-identical
    * WITHOUT rounding (rounding would itself introduce .xxxx5 tie-break
    * divergence between the engines' rounding implementations). */
  def davg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  /** DuckDB-side fragments mirroring dec2/dsum/davg exactly. */
  def dec2Sql(x: String): String = s"CAST(($x) AS DECIMAL(12,2))"
  def dsumSql(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(12,2))) AS DOUBLE)"
  def davgSql(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(12,2))) AS DOUBLE) / count($x)"
}

/** Flagship slice: scan → filter → hash-agg → sort (TPC-H Q1 shape)
  * plus the basic projection/filter/selection family (SURVEY §2.2).
  *
  * Reference semantics: pandas `groupby().agg()` (pandas/core/groupby/
  * generic.py:1304) and boolean-mask selection (pandas/core/frame.py:2770).
  */
object CoreQueries extends QueryModule {
  import Q._

  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${dsumSql("l_quantity")} AS sum_qty,
      |  ${dsumSql("l_extendedprice")} AS sum_base_price,
      |  CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${dec2Sql("l_discount")})) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${dec2Sql("l_discount")}) * (1 + ${dec2Sql("l_tax")})) AS DOUBLE) AS sum_charge,
      |  ${davgSql("l_quantity")} AS avg_qty,
      |  ${davgSql("l_extendedprice")} AS avg_price,
      |  ${davgSql("l_discount")} AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Sql)),

    // Degenerate-result pin: a filter matching nothing must round-trip
    // the gate as zero rows with the right schema on both engines.
    QueryDef("empty_result",
      (s, d) => Tables.nation(s, d)
        .filter(col("n_nationkey") < 0)
        .select("n_nationkey", "n_name"),
      Some("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 0"))
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join family (SURVEY §2.3; reference: pandas/core/reshape/merge.py:38
  * merge, :466 _MergeOperation, :1211 _OrderedMerge).
  *
  * The equi-join itself is Catalyst's job (broadcast-hash / SMJ /
  * shuffled-hash chosen by CBO+AQE — the reference's factorized hash join
  * at merge.py:1077 is subsumed). What we add is the pandas API surface:
  * suffix resolution, how='outer' naming, indicator, validate.
  */
object JoinOps {

  /** pandas merge(on=, how=, suffixes=, indicator=). Null keys never
    * match, matching both pandas (NA group excluded, _libs/join.pyx:25)
    * and SQL `=`. */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String,
      suffixes: (String, String) = ("_x", "_y"),
      indicator: Boolean = false): DataFrame = {
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- on.toSet
    val l0 = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r0 = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    val sparkHow = how match {
      case "outer" => "full_outer"
      case h => h
    }
    if (!indicator) l0.join(r0, on, sparkHow)
    else {
      val lm = l0.withColumn("__lp", lit(1))
      val rm = r0.withColumn("__rp", lit(1))
      lm.join(rm, on, sparkHow)
        .withColumn("_merge",
          when(col("__lp").isNotNull && col("__rp").isNotNull, lit("both"))
            .when(col("__lp").isNotNull, lit("left_only"))
            .otherwise(lit("right_only")))
        .drop("__lp", "__rp")
    }
  }

  /** merge(validate=): pre-join uniqueness assertions ('1:1','1:m','m:1').
    * One aggregation action per checked side — run before the join at the
    * caller's discretion (it is an action, not a plan). */
  def validateKeys(df: DataFrame, on: Seq[String], unique: Boolean): Boolean = {
    if (!unique) true
    else df.groupBy(on.map(col): _*).count().filter(col("count") > 1).isEmpty
  }

  /** merge_ordered (reference merge.py:131): full outer on the ordered
    * key, then forward-fill each side's columns along the key order.
    * fillCols are filled with last-non-null over (unbounded, 0].
    *
    * Scale note: the window is unpartitioned when `groups` is empty —
    * callers merging long series should pass group columns (pandas'
    * left_by/right_by) to keep the sort distributed.
    */
  def mergeOrdered(left: DataFrame, right: DataFrame, on: String,
      fillCols: Seq[String], groups: Seq[String] = Nil): DataFrame = {
    val joined = left.join(right, (groups :+ on).toSeq, "full_outer")
    val w = (if (groups.isEmpty) Window.partitionBy()
             else Window.partitionBy(groups.map(col): _*))
      .orderBy(col(on).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    fillCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Cartesian product (pandas has only the dummy-key idiom). */
  def cross(left: DataFrame, right: DataFrame): DataFrame = left.crossJoin(right)
}

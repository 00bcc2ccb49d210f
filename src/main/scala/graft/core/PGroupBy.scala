package graft.core

import graft.operators.GroupOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deferred grouped view of a PFrame — the engine's DataFrameGroupBy
  * (reference: pandas/core/groupby/groupby.py:2066). Aggregations
  * reduce to one row per group; transforms/cumulatives keep the frame
  * shape via window functions (one shuffle on the keys either way).
  */
final case class PGroupBy(frame: PFrame, keys: Seq[String]) {

  private def order: Seq[Column] = {
    val o = frame.withOrder
    Seq(col(o.orderCol.get))
  }

  /** groupby().agg(...): named aggregate expressions. */
  def agg(exprs: (String, Column)*): PFrame =
    PFrame(frame.df.groupBy(keys.map(col): _*)
      .agg(exprs.head._2.as(exprs.head._1),
        exprs.tail.map { case (n, e) => e.as(n) }: _*), keys, None)

  def count(): PFrame = agg("count" -> org.apache.spark.sql.functions.count(lit(1)))

  def sum(cols: String*): PFrame =
    agg(cols.map(c => s"sum_$c" -> org.apache.spark.sql.functions.sum(col(c))): _*)

  def mean(cols: String*): PFrame =
    agg(cols.map(c => s"mean_$c" -> avg(col(c))): _*)

  /** groupby().transform(agg) — broadcast back to rows, no join. */
  def transform(name: String, aggExpr: Column): PFrame =
    frame.copy(df = frame.df.withColumn(name, GroupOps.transform(aggExpr, keys)))

  def cumsum(c: String, as: String): PFrame = {
    val o = frame.withOrder
    o.copy(df = o.df.withColumn(as, GroupOps.cumAgg(
      org.apache.spark.sql.functions.sum(col(c)), keys, Seq(col(o.orderCol.get)))))
  }

  def cumcount(as: String): PFrame = {
    val o = frame.withOrder
    o.copy(df = o.df.withColumn(as,
      GroupOps.cumcount(keys, Seq(col(o.orderCol.get)))))
  }

  def shift(c: String, n: Int, as: String): PFrame = {
    val o = frame.withOrder
    o.copy(df = o.df.withColumn(as,
      GroupOps.shift(col(c), n, keys, Seq(col(o.orderCol.get)))))
  }

  def rank(c: String, as: String): PFrame =
    frame.copy(df = frame.df.withColumn(as,
      org.apache.spark.sql.functions.rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(c).asc))))

  /** groupby().filter(size >= n). */
  def filterBySize(minSize: Long): PFrame =
    frame.copy(df = GroupOps.filterBySize(frame.df, keys, minSize))

  /** groupby().rolling(n) — the partitioned rolling view. */
  def rolling(n: Int, minPeriods: Int = 1): PRolling =
    PRolling(frame, keys, n, minPeriods)

  /** groupby().resample(width) — grouped tumbling buckets. */
  def resample(tsCol: String, width: String): PResampler =
    PResampler(frame, tsCol, width, keys)

  /** groupby().ewm(alpha) — per-group EWM recurrence. */
  def ewm(alpha: Double): PEwm = PEwm(frame, keys, alpha)

  /** groupby().nth(n) (0-based). */
  def nth(n: Int): PFrame = {
    val o = frame.withOrder
    o.copy(df = GroupOps.nth(o.df, keys, Seq(col(o.orderCol.get)), n))
  }
}

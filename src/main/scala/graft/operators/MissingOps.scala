package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Missing-data operators (SURVEY.md §2.9 missing-data block; reference:
  * pandas/core/generic.py:5606 fillna, core/missing.py:111 interpolate_1d).
  *
  * All are window compositions over an explicit (group, order) — a single
  * shuffle on the group keys, no global sort unless the caller passes no
  * groups (documented single-partition hazard, same trade the reference
  * makes by being single-node).
  */
object MissingOps {

  private def w(groups: Seq[String], order: String): WindowSpec = {
    val base = if (groups.isEmpty) Window.partitionBy() else Window.partitionBy(groups.map(col): _*)
    base.orderBy(col(order).asc)
  }

  /** ffill / pad: last non-null at-or-before this row. */
  def ffill(c: Column, groups: Seq[String], order: String): Column =
    last(c, ignoreNulls = true)
      .over(w(groups, order).rowsBetween(Window.unboundedPreceding, 0))

  /** bfill: first non-null at-or-after this row. */
  def bfill(c: Column, groups: Seq[String], order: String): Column =
    first(c, ignoreNulls = true)
      .over(w(groups, order).rowsBetween(0, Window.unboundedFollowing))

  /** ffill with `limit`: only fill gaps of at most `limit` rows
    * (reference: fillna(limit=) pandas/core/generic.py:5606). The fill
    * value must come from within the trailing `limit+1` rows.
    */
  def ffillLimit(c: Column, groups: Seq[String], order: String, limit: Int): Column =
    last(c, ignoreNulls = true)
      .over(w(groups, order).rowsBetween(-limit.toLong, 0))

  def bfillLimit(c: Column, groups: Seq[String], order: String, limit: Int): Column =
    first(c, ignoreNulls = true)
      .over(w(groups, order).rowsBetween(0, limit.toLong))

  /** Linear interpolation between the surrounding non-null values
    * (reference: core/missing.py:111 interpolate_1d, method='linear' —
    * position-weighted, like method='index' over the order column).
    *
    * Two window passes: previous/next non-null value plus their positions,
    * then the closed-form prev + (next-prev) * (pos-prevPos)/(nextPos-prevPos).
    * Edges stay null on the left (no limit_direction='both' default) and
    * ffill on the right mirrors pandas' default trailing behavior.
    */
  def interpolateLinear(c: Column, posCol: Column, groups: Seq[String],
      order: String): Column = {
    val before = w(groups, order).rowsBetween(Window.unboundedPreceding, 0)
    val after  = w(groups, order).rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(c, ignoreNulls = true).over(before)
    val nextV = first(c, ignoreNulls = true).over(after)
    val prevP = last(when(c.isNotNull, posCol), ignoreNulls = true).over(before)
    val nextP = first(when(c.isNotNull, posCol), ignoreNulls = true).over(after)
    when(c.isNotNull, c)
      .when(prevV.isNull, lit(null))
      .when(nextV.isNull, prevV) // trailing nulls: pandas pads forward
      .otherwise(prevV + (nextV - prevV) * (posCol - prevP) / (nextP - prevP))
  }

  /** dropna(thresh): keep rows with at least `thresh` non-null among cols. */
  def dropnaThresh(df: DataFrame, cols: Seq[String], thresh: Int): DataFrame =
    df.filter(
      cols.map(c => when(col(c).isNotNull, 1).otherwise(0))
        .reduce(_ + _) >= thresh)

  /** replace(valueMap) for one column (reference: generic.py:6098). */
  def replaceValues(c: Column, mapping: Seq[(Any, Any)]): Column =
    mapping.foldLeft(c)((acc, kv) => when(c === lit(kv._1), lit(kv._2)).otherwise(acc))
}

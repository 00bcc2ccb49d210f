package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-selection operators whose semantics go beyond Spark built-ins
  * (SURVEY.md §2.2, §2.6).
  */
object SelectionOps {

  /** pandas drop_duplicates with deterministic `keep` semantics
    * (reference: pandas/core/frame.py:4451; algorithms.py:761).
    *
    * Spark's `dropDuplicates` keeps an *arbitrary* row per key — fine for
    * blind dedup, wrong for keep='first'/'last'. We pin the choice with a
    * window ordered by `order` (a deterministic tiebreak column list):
    *   keep='first' → row_number over (subset, orderBy order) == 1
    *   keep='last'  → same with descending order
    *   keep=false   → count over subset == 1 (drop all dupes)
    *
    * Scale: one hash shuffle on `subset` — the same cost as groupBy — and
    * AQE handles skewed keys. No global sort.
    */
  def dropDuplicates(df: DataFrame, subset: Seq[String], keep: String,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(subset.map(col): _*)
    keep match {
      case "first" =>
        df.withColumn("__rn", row_number().over(w.orderBy(order.map(_.asc): _*)))
          .filter(col("__rn") === 1).drop("__rn")
      case "last" =>
        df.withColumn("__rn", row_number().over(w.orderBy(order.map(_.desc): _*)))
          .filter(col("__rn") === 1).drop("__rn")
      case "none" | "false" =>
        df.withColumn("__cnt", count(lit(1)).over(w))
          .filter(col("__cnt") === 1).drop("__cnt")
      case other => throw new IllegalArgumentException(s"keep=$other")
    }
  }

  /** duplicated() mask materialized as the duplicate rows themselves. */
  def duplicated(df: DataFrame, subset: Seq[String], keep: String,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(subset.map(col): _*)
    keep match {
      case "first" =>
        df.withColumn("__rn", row_number().over(w.orderBy(order.map(_.asc): _*)))
          .filter(col("__rn") > 1).drop("__rn")
      case "last" =>
        df.withColumn("__rn", row_number().over(w.orderBy(order.map(_.desc): _*)))
          .filter(col("__rn") > 1).drop("__rn")
      case _ =>
        df.withColumn("__cnt", count(lit(1)).over(w))
          .filter(col("__cnt") > 1).drop("__cnt")
    }
  }

  /** nlargest/nsmallest (reference: pandas/core/frame.py:4649;
    * algorithms.py:1045 SelectN — a partial sort).
    *
    * `orderBy(...).limit(n)` lets Catalyst plan TakeOrderedAndProject —
    * a true distributed top-k (per-partition heap + driver merge), never a
    * full sort. `tiebreak` pins pandas keep='first' determinism; null sort
    * keys are dropped like pandas drops NaN rows.
    */
  def nlargest(df: DataFrame, n: Int, cols: Seq[String], tiebreak: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .orderBy(cols.map(col(_).desc) ++ tiebreak.map(col(_).asc): _*).limit(n)

  /** Series.searchsorted(probes) over the column's sort order: the
    * insertion index of probe p is the count of values < p (side='left')
    * or <= p (side='right') — one conditional-count aggregate pass, no
    * sort, no shuffle beyond the final 1-row reduce (reference:
    * pandas/core/series.py:2337; probes are few by construction).
    * Output long form: (probe, idx). */
  def searchsorted(df: DataFrame, c: String, probes: Seq[Double],
      side: String = "left"): DataFrame = {
    val aggs = probes.zipWithIndex.map { case (p, i) =>
      // coalesce: sum over zero rows is null; pandas returns 0
      coalesce(sum(when(if (side == "right") col(c) <= p else col(c) < p, 1L)
        .otherwise(0L)), lit(0L)).as(s"__i$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = probes.zipWithIndex.map { case (p, i) =>
      one.select(lit(p).as("probe"), col(s"__i$i").as("idx"))
    }
    stacked.reduce(_ unionByName _)
  }

  def nsmallest(df: DataFrame, n: Int, cols: Seq[String], tiebreak: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .orderBy(cols.map(col(_).asc) ++ tiebreak.map(col(_).asc): _*).limit(n)

  /** where/mask (reference: pandas/core/generic.py:8466): conditional
    * replacement, not row filtering. */
  def where(df: DataFrame, cond: Column, targets: Seq[String],
      other: Column = lit(null)): DataFrame =
    targets.foldLeft(df)((d, c) => d.withColumn(c, when(cond, col(c)).otherwise(other)))

  def mask(df: DataFrame, cond: Column, targets: Seq[String],
      other: Column = lit(null)): DataFrame =
    where(df, !cond, targets, other)

  /** clip (reference: pandas/core/generic.py:6862). */
  def clip(c: Column, lower: Option[Column], upper: Option[Column]): Column = {
    val lo = lower.map(l => greatest(c, l)).getOrElse(c)
    upper.map(u => least(lo, u)).getOrElse(lo)
  }

  /** head-n with deterministic order (pandas head relies on physical
    * order; we require explicit order columns — SURVEY §1.4). Top-k plan,
    * not a full sort. */
  def head(df: DataFrame, n: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order.map(_.asc): _*).limit(n)

  /** Last n rows in ORIGINAL order (pandas tail keeps ascending order):
    * top-k on the reversed order, then re-sort ascending. */
  def tail(df: DataFrame, n: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order.map(_.desc): _*).limit(n).orderBy(order.map(_.asc): _*)
}

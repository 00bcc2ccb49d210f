package graft.core

import graft.operators
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Labeled-frame wrapper: the engine's answer to the reference's
  * index/alignment semantics (reference: pandas/core/generic.py:92 NDFrame,
  * pandas/core/indexes/base.py:164 Index — see SURVEY.md §1.4).
  *
  * A `PFrame` is a lazy Catalyst plan (`df`) plus
  *   - `indexCols`: the columns acting as the row-label Index. Alignment
  *     (the implicit outer-join the reference performs before every binary
  *     op, pandas/core/ops.py:948) becomes an explicit `full_outer` join on
  *     these columns.
  *   - `orderCol`: an optional column giving a deterministic total order,
  *     materialized lazily the first time a positional operator (shift,
  *     head, cumsum, dedup keep='first') needs one.
  *
  * Scale note: the reference keeps an O(1) hash index per frame; at 100 TB
  * a materialized index is the wrong trade — Spark's shuffle-on-key
  * subsumes it, and `orderCol` keeps positional semantics without a global
  * sort until one is genuinely requested.
  */
final case class PFrame(
    df: DataFrame,
    indexCols: Seq[String] = Nil,
    orderCol: Option[String] = None) {

  def valueCols: Seq[String] =
    df.columns.toSeq.filterNot(c => indexCols.contains(c) || orderCol.contains(c))

  /** Ensure a deterministic order column exists; synthesizes global row
    * numbers over the index ordering when absent. Positional ops call
    * this. Routed through DistScan's bucketed two-pass plan (range
    * exchange + per-bucket row_number + collected prefix offsets) so the
    * public API never plans a single-partition WindowExec — the r2
    * verdict's scale-killer default (an unpartitioned
    * `row_number().over(Window.orderBy(...))`).
    */
  def withOrder: PFrame = orderCol match {
    case Some(_) => this
    case None =>
      require(indexCols.nonEmpty,
        "positional op needs an order: set an index or supply orderCol")
      val oc = "__order__"
      val (ranked, _) =
        operators.DistScan.withGlobalRowNumber(df, indexCols.map(col), oc)
      PFrame(ranked, indexCols, Some(oc))
  }

  def setIndex(cols: String*): PFrame = copy(indexCols = cols)
  def resetIndex: PFrame = copy(indexCols = Nil)

  // MultiIndex level utilities (reference: pandas/core/generic.py
  // swaplevel/droplevel, indexes/multi.py reorder_levels). The index is
  // ordinary columns here, so these are metadata-only — no data movement,
  // no plan change beyond column bookkeeping.
  def swaplevel(i: Int = 0, j: Int = 1): PFrame = {
    require(indexCols.length > math.max(i, j), s"index has ${indexCols.length} levels")
    copy(indexCols = indexCols.updated(i, indexCols(j)).updated(j, indexCols(i)))
  }

  /** droplevel: remove an index level. The column stays in the frame
    * (pandas discards it; callers drop() explicitly when wanted) — kept
    * so the operation is lossless and lazily cheap. */
  def droplevel(level: String): PFrame = {
    require(indexCols.contains(level), s"no index level $level in $indexCols")
    copy(indexCols = indexCols.filterNot(_ == level))
  }

  def reorderLevels(order: Seq[String]): PFrame = {
    require(order.sorted == indexCols.sorted,
      s"reorder_levels must permute $indexCols, got $order")
    copy(indexCols = order)
  }

  def select(cols: String*): PFrame =
    copy(df = df.select((indexCols ++ orderCol ++ cols).distinct.map(col): _*))

  def filter(cond: Column): PFrame = copy(df = df.filter(cond))

  def withColumn(name: String, c: Column): PFrame = copy(df = df.withColumn(name, c))

  /** Rename via one select so swap mappings (a->b, b->a) stay correct —
    * a sequential withColumnRenamed fold would collide mid-fold. */
  def rename(mapping: (String, String)*): PFrame = {
    val m = mapping.toMap
    copy(
      df = df.select(df.columns.toSeq.map(c => col(c).as(m.getOrElse(c, c))): _*),
      indexCols = indexCols.map(c => m.getOrElse(c, c)),
      orderCol = orderCol.map(c => m.getOrElse(c, c)))
  }

  def drop(cols: String*): PFrame = copy(df = df.drop(cols: _*))

  /** filter(items=/like=/regex=) on column LABELS (reference
    * generic.py:4175) — pure projection, no data movement. */
  def filterCols(items: Seq[String] = Nil, like: Option[String] = None,
      regex: Option[String] = None): PFrame = {
    val keep = df.columns.filter { c =>
      (items.nonEmpty && items.contains(c)) ||
        like.exists(c.contains) || regex.exists(r => r.r.findFirstIn(c).isDefined)
    }
    val withIdx = (indexCols ++ keep).distinct
    copy(df = df.select(withIdx.map(col): _*))
  }

  /** pop: return (column frame, remainder) — reference generic.py:765. */
  def pop(c: String): (PFrame, PFrame) =
    (copy(df = df.select((indexCols :+ c).map(col): _*)), drop(c))

  /** squeeze: single-value-column frame → that column's name (the
    * caller reads it as a PSeries); multi-column frames are returned
    * unchanged, like pandas. */
  def squeeze: Either[PFrame, String] = {
    val vals = valueCols
    if (vals.size == 1) Right(vals.head) else Left(this)
  }

  /** xs(key): cross-section — filter one index level to a literal and
    * drop that level (reference generic.py:3260). */
  def xs(level: String, key: Any): PFrame = {
    require(indexCols.contains(level), s"$level is not an index level")
    copy(df = df.filter(col(level) === lit(key)).drop(level),
      indexCols = indexCols.filterNot(_ == level))
  }

  def sortValues(by: Seq[String], ascending: Seq[Boolean] = Nil,
      naPosition: String = "last"): PFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    val sortCols = by.zip(asc).map { case (c, a) =>
      (a, naPosition) match {
        case (true, "last")   => col(c).asc_nulls_last
        case (true, _)        => col(c).asc_nulls_first
        case (false, "last")  => col(c).desc_nulls_last
        case (false, _)       => col(c).desc_nulls_first
      }
    }
    copy(df = df.orderBy(sortCols: _*))
  }

  /** Outer-align two frames on their shared index — the engine primitive
    * behind every aligned binary op (reference: NDFrame.align,
    * pandas/core/generic.py:8037). Returns (joined, leftCol, rightCol)
    * resolvers for value columns.
    */
  def align(other: PFrame): (DataFrame, String => Column, String => Column) = {
    require(indexCols.nonEmpty && indexCols == other.indexCols,
      s"alignment needs matching index columns: $indexCols vs ${other.indexCols}")
    val l = df.select(indexCols.map(col) ++ valueCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = other.df.select(
      other.indexCols.map(col) ++ other.valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val joined = l.join(r, indexCols, "full_outer")
    (joined, c => col(s"__l_$c"), c => col(s"__r_$c"))
  }

  /** Aligned elementwise binary op over the intersection-by-name of value
    * columns; unmatched rows yield null (reference yields NaN).
    */
  def binOp(other: PFrame, op: (Column, Column) => Column): PFrame = {
    val (joined, lc, rc) = align(other)
    val common = valueCols.intersect(other.valueCols)
    val out = joined.select(indexCols.map(col) ++ common.map(c => op(lc(c), rc(c)).as(c)): _*)
    PFrame(out, indexCols, None)
  }

  def plus(other: PFrame): PFrame  = binOp(other, _ + _)
  def minus(other: PFrame): PFrame = binOp(other, _ - _)
  def times(other: PFrame): PFrame = binOp(other, _ * _)
  def div(other: PFrame): PFrame   = binOp(other, _ / _)

  // ---- pandas-surface conveniences (delegate to the operator layer) ----

  /** df.query("a > 1 and b in ['x','y']") — the reference's expression
    * grammar (pandas/core/frame.py:2889) via expr/QueryExpr. */
  def query(q: String, vars: Map[String, Any] = Map.empty): PFrame =
    filter(graft.expr.QueryExpr.translate(q, vars))

  /** df.eval("c = a + b\nd = c > 1"): assignment program over the same
    * grammar (reference eval.py:156); sequential withColumn so later
    * lines see earlier targets. */
  def eval(program: String, vars: Map[String, Any] = Map.empty): PFrame =
    graft.expr.QueryExpr.evalAssignments(program, vars).foldLeft(this) {
      case (f, (name, c)) => f.withColumn(name, c)
    }

  def head(n: Int): PFrame = {
    val o = withOrder
    o.copy(df = operators.SelectionOps.head(o.df, n, Seq(col(o.orderCol.get))))
  }

  def tail(n: Int): PFrame = {
    val o = withOrder
    o.copy(df = operators.SelectionOps.tail(o.df, n, Seq(col(o.orderCol.get))))
  }

  /** drop_duplicates with pinned keep semantics (needs an order). */
  def dropDuplicates(subset: Seq[String], keep: String = "first"): PFrame = {
    val o = withOrder
    o.copy(df = operators.SelectionOps.dropDuplicates(
      o.df, subset, keep, Seq(col(o.orderCol.get))))
  }

  def fillna(values: Map[String, Any]): PFrame =
    copy(df = df.na.fill(values))

  def dropna(how: String = "any", subset: Seq[String] = Nil): PFrame = {
    val cols = if (subset.isEmpty) valueCols else subset
    copy(df = df.na.drop(how, cols))
  }

  def isin(colName: String, values: Seq[Any]): PFrame =
    filter(col(colName).isin(values: _*))

  def astype(casts: (String, String)*): PFrame =
    copy(df = casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) })

  def nlargest(n: Int, by: Seq[String]): PFrame =
    copy(df = operators.SelectionOps.nlargest(df, n, by, indexCols))

  def nsmallest(n: Int, by: Seq[String]): PFrame =
    copy(df = operators.SelectionOps.nsmallest(df, n, by, indexCols))

  /** pandas merge — suffix/indicator semantics via JoinOps. */
  def merge(other: PFrame, on: Seq[String], how: String = "inner",
      suffixes: (String, String) = ("_x", "_y"),
      indicator: Boolean = false): PFrame =
    PFrame(operators.JoinOps.merge(df, other.df, on, how, suffixes, indicator),
      on, None)

  def valueCounts(colName: String): PFrame =
    PFrame(df.groupBy(colName).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(colName).asc), Seq(colName), None)

  /** Deferred group-by view (reference: DataFrameGroupBy). */
  def groupby(keys: String*): PGroupBy = PGroupBy(this, keys)

  /** groupby(Grouper(key, freq), extraKeys...) — the unified time-bucket
    * spelling (reference core/groupby/grouper.py:30): materializes the
    * freq bucket as a column and delegates to the ordinary grouped path
    * (identical plan to resample). */
  def groupby(g: Grouper, extra: String*): PGroupBy = {
    val bname = s"${g.key}_bucket"
    PGroupBy(PFrame(df.withColumn(bname, Grouper.bucket(col(g.key), g.freq)),
      indexCols, orderCol), bname +: extra)
  }

  /** rolling(n) over the frame's order (pass keys via groupby().rolling
    * — PGroupBy.rolling — for the partitioned form). */
  def rolling(n: Int, minPeriods: Int = 1): PRolling =
    PRolling(this, Nil, n, minPeriods)

  /** resample(width) tumbling buckets on a timestamp column. */
  def resample(tsCol: String, width: String): PResampler =
    PResampler(this, tsCol, width, Nil)

  /** ewm(alpha).mean — adjust=false recurrence via the typed Aggregator. */
  def ewm(alpha: Double): PEwm = PEwm(this, Nil, alpha)

  /** combine_first: aligned coalesce (reference: pandas/core/frame.py:5138). */
  /** info(): schema + optimizer row/size estimates — driver-side
    * metadata only, no scan (reference frame.py:2147). */
  def info(): String = {
    val stats = df.queryExecution.optimizedPlan.stats
    val fields = df.schema.fields.map(f =>
      s"  ${f.name}: ${f.dataType.simpleString}${if (f.nullable) "" else " not null"}")
    (s"PFrame[index=${indexCols.mkString(",")}]" +:
      s"estimated rows=${stats.rowCount.getOrElse("?")} bytes=${stats.sizeInBytes}" +:
      fields).mkString("\n")
  }

  /** memory_usage(): optimizer size estimate in bytes (plan statistics;
    * the reference reports ndarray nbytes — same contract, no scan). */
  def memoryUsage: BigInt = df.queryExecution.optimizedPlan.stats.sizeInBytes

  def combineFirst(other: PFrame): PFrame = {
    val (joined, lc, rc) = align(other)
    val all = (valueCols ++ other.valueCols).distinct
    val out = joined.select(indexCols.map(col) ++ all.map { c =>
      val has = (valueCols.contains(c), other.valueCols.contains(c))
      (has match {
        case (true, true)  => coalesce(lc(c), rc(c))
        case (true, false) => lc(c)
        case _             => rc(c)
      }).as(c)
    }: _*)
    PFrame(out, indexCols, None)
  }

  /** update(other): aligned coalesce the OTHER direction from
    * combine_first — other's non-null values overwrite this frame's, the
    * frame's own labels/columns never grow (reference:
    * pandas/core/frame.py:5217; overwrite=True form). Realized as a LEFT
    * join on the index (other is typically the small patch frame — mark
    * it `broadcast()` at the call site and no shuffle of self occurs).
    */
  def update(other: PFrame): PFrame = {
    require(indexCols.nonEmpty && indexCols == other.indexCols,
      s"update needs matching index columns: $indexCols vs ${other.indexCols}")
    // pandas raises on duplicate labels in `other`; a silent left join
    // would instead FAN OUT matching base rows. One cheap count-agg on
    // the same key (same shuffle) guards the invariant.
    val dup = other.df.groupBy(other.indexCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"update: duplicate index labels in other (e.g. ${dup.headOption})")
    val r = other.df.select(
      other.indexCols.map(col) ++ other.valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val joined = df.join(r, indexCols, "left")
    val out = joined.select(indexCols.map(col) ++ valueCols.map { c =>
      (if (other.valueCols.contains(c)) coalesce(col(s"__r_$c"), col(c))
       else col(c)).as(c)
    }: _*)
    PFrame(out, indexCols, None)
  }

  /** combine(other, func): aligned elementwise combine over the UNION of
    * columns (reference: pandas/core/frame.py:4970) — each shared column
    * pair goes through `func`; one-sided columns pass through (fill_value
    * semantics are the caller's via the function).
    */
  def combine(other: PFrame, func: (Column, Column) => Column): PFrame = {
    val (joined, lc, rc) = align(other)
    val all = (valueCols ++ other.valueCols).distinct
    val out = joined.select(indexCols.map(col) ++ all.map { c =>
      val has = (valueCols.contains(c), other.valueCols.contains(c))
      (has match {
        case (true, true)  => func(lc(c), rc(c))
        case (true, false) => lc(c)
        case _             => rc(c)
      }).as(c)
    }: _*)
    PFrame(out, indexCols, None)
  }
}

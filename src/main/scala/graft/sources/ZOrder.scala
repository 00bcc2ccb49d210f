package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout writer — MULTI-column data skipping
  * for parquet lakes, the layout tier the single-column
  * `parquet_sorted_layout` gate cannot reach.
  *
  * A linear sort on column A gives perfect row-group min/max pruning on
  * A and NONE on B: every file spans B's full range. Interleaving the
  * high bits of A and B into one Morton key and range-partitioning on
  * that key tiles the (A, B) plane into near-square cells, so each
  * output file covers a SMALL range of BOTH columns — parquet footer
  * stats then skip most files for a selective predicate on either
  * column (or both). This is the publicly documented layout behind
  * Delta Lake's `OPTIMIZE ZORDER BY` and the reference's multi-level
  * `sort_index` locality story (pandas/core/sorting.py:102
  * get_group_index — the same "fold several keys into one orderable
  * integer" idea, there for groupby, here for storage locality).
  *
  * Scale shape: ONE bounded 1-row min/max aggregate (driver literal),
  * then a scan-local Morton-key projection (pure shiftleft/and/or
  * column arithmetic — whole-stage codegen, no UDF), ONE range
  * exchange on the key, and a per-partition sort. Cost is identical to
  * the plain sorted-layout rewrite; only the sort key differs.
  */
object ZOrder {

  /** Scan-local linear normalization of `c` onto the `bits`-bit grid
    * [0, 2^bits): floor((c − min) · (2^bits − 1) / (max − min)),
    * clamped. Double scaling is deterministic per row and exactness is
    * irrelevant here — the key only decides STORAGE placement; query
    * results never depend on it. A degenerate (min = max) column maps
    * to 0. NULL maps to 0 so null rows cluster at the curve origin
    * instead of poisoning the whole key to NULL (a NULL range key
    * would collect every null row into one boundary partition). */
  def normalizeToGrid(c: Column, min: Double, max: Double,
      bits: Int): Column = {
    val cells = (1L << bits) - 1
    val scaled =
      if (max <= min) lit(0L)
      else least(lit(cells),
        greatest(lit(0L),
          // multiply BEFORE dividing: (max−min)·cells/(max−min) is
          // exact in double, while pre-folding cells/(max−min) rounds
          // (255/100 = 2.55…) and floors the top value into cell
          // cells−1 instead of cells
          floor((c.cast("double") - lit(min)) * cells.toDouble /
            (max - min)).cast("long")))
    coalesce(scaled, lit(0L))
  }

  /** Morton interleave of pre-normalized `bits`-bit cell coordinates:
    * bit i of column j lands at position i·m + j. m·bits must fit a
    * long's 63 value bits. Pure column arithmetic — m·bits shift/mask
    * terms summed with bitwise OR, all inside whole-stage codegen. */
  def interleaveBits(cells: Seq[Column], bits: Int): Column = {
    val m = cells.length
    require(m >= 1, "interleaveBits: need at least one column")
    require(m * bits <= 63, s"interleaveBits: $m cols x $bits bits " +
      s"= ${m * bits} exceeds a long's 63 value bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * m + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The composed Morton key for raw numeric columns with driver-known
    * [min, max] ranges (one bounded agg upstream produces these). */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bits: Int): Column =
    interleaveBits(
      cols.zip(ranges).map { case (c, (lo, hi)) =>
        normalizeToGrid(c, lo, hi, bits) },
      bits)

  /** Rewrite `df` to `outPath` z-ordered on `zCols` across `nFiles`
    * files. Plan: 1-row min/max agg (driver literal) → scan-local
    * Morton projection → ONE range exchange → per-partition sort →
    * write (key column dropped; the narrow projection after
    * sortWithinPartitions preserves intra-partition order). Returns
    * the frame read back from `outPath`. */
  def writeZOrdered(df: DataFrame, outPath: String, zCols: Seq[String],
      bits: Int = 16, nFiles: Int = 8): DataFrame = {
    require(zCols.nonEmpty, "writeZOrdered: need at least one z column")
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
      .collect()(0) // bounded: exactly one row, 2·|zCols| doubles
    val ranges = zCols.indices.map { i =>
      // an all-null column yields null min/max → degenerate (0, 0)
      // range, which normalizeToGrid maps to cell 0 for every row
      if (stats.isNullAt(2 * i)) (0.0, 0.0)
      else (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    val keyed = df.withColumn("__z",
      zValue(zCols.map(col), ranges, bits))
    keyed
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    df.sparkSession.read.parquet(outPath)
  }
}

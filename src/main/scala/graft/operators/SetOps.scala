package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7; reference: pandas/core/reshape/concat.py:24,
  * pandas/core/indexes/base.py:2767-2980).
  */
object SetOps {

  /** concat(axis=0, join='outer'): union by name, missing columns null-padded
    * (reference: _Concatenator, reshape/concat.py:232). */
  def concatOuter(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** concat(axis=0, join='inner'): only the shared columns survive. */
  def concatInner(frames: Seq[DataFrame]): DataFrame = {
    val common = frames.map(_.columns.toSeq).reduce(_ intersect _)
    frames.map(_.select(common.map(col): _*)).reduce(_ union _)
  }

  /** concat(keys=...): tag each input with its source key (long form). */
  def concatKeys(frames: Seq[(String, DataFrame)], keyCol: String): DataFrame =
    concatOuter(frames.map { case (k, f) => f.withColumn(keyCol, lit(k)) })

  /** Index.union / intersection / difference / symmetric_difference.
    * All by-name (ADVICE r1): positional union silently misaligns two
    * frames whose identical columns sit in different order. */
  def union(a: DataFrame, b: DataFrame): DataFrame        = a.unionByName(b).distinct()
  def intersection(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b.select(a.columns.toSeq.map(col): _*))
  def difference(a: DataFrame, b: DataFrame): DataFrame   = a.except(b.select(a.columns.toSeq.map(col): _*))
  def symmetricDifference(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(a.columns.toSeq.map(col): _*)
    a.except(bb).unionByName(bb.except(a))
  }

  /** equals: exact multiset equality (reference: generic.py:1383). */
  def frameEquals(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** DataFrame.compare (reference frame.py:7599, pandas ≥1.1): align
    * `a` (self) and `b` (other) on `keys` and emit one row per
    * DIFFERING cell in tidy long form — (keys…, column, self, other),
    * values rendered as strings for OUTPUT only, so heterogeneous
    * column types share one frame (the Spark-native equivalent of
    * pandas' MultiIndex column pairs). Difference is decided on the
    * NATIVE values with null-safe <=>: both-NULL cells are equal
    * (pandas' NaN==NaN convention) and −0.0 equals 0.0, where a
    * string-rendered comparison would report a spurious diff. A row
    * missing on one side surfaces EVERY compared column — presence is
    * tracked with explicit markers, so a present-side NULL cell still
    * surfaces the missing row instead of vanishing into NULL<=>NULL.
    * pandas raises on label mismatch — distributed frames have no
    * shared row labels, so the outer join IS the alignment.
    *
    * Shape: ONE key-clustered full-outer join, then a row-local
    * filtered explode of per-column (column, self, other) structs —
    * no shuffle beyond the join at any scale. */
  def frameCompare(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "frameCompare: need at least one key column")
    require(compareCols.nonEmpty, "frameCompare: need compare columns")
    val l = a.withColumn("__lp", lit(true)).alias("l")
    val r = b.withColumn("__rp", lit(true)).alias("r")
    val cond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val bothPresent = col("l.__lp").isNotNull && col("r.__rp").isNotNull
    val diffs = array(compareCols.map { c =>
      struct(lit(c).as("column"),
        col(s"l.$c").cast("string").as("self"),
        col(s"r.$c").cast("string").as("other"),
        (!bothPresent || !(col(s"l.$c") <=> col(s"r.$c"))).as("__diff"))
    }: _*)
    l.join(r, cond, "full_outer")
      .select(keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+
        explode(filter(diffs, d => d.getField("__diff"))).as("__d"): _*)
      .select(keys.map(col) :+ col("__d.column").as("column") :+
        col("__d.self").as("self") :+ col("__d.other").as("other"): _*)
  }
}

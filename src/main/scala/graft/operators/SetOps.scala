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
}

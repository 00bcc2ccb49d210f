package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshapes beyond single melt/pivot (SURVEY §2.8; reference:
  * pandas/core/reshape/melt.py:181 wide_to_long, :111 lreshape,
  * reshape.py:31 _Unstacker).
  */
object ReshapeOps {

  /** wide_to_long(df, stubnames, i, j): columns named `<stub><sep><suffix>`
    * become long rows keyed by (i, j=suffix) with one value column per
    * stub. A flat map over rows (inline explode of per-suffix structs) —
    * no shuffle, codegen-friendly, same plan family as melt's stack().
    * Suffixes are taken from the column names (driver-side schema work,
    * no data scan). A stub missing some suffix yields nulls, matching the
    * reference's NaN fill.
    */
  def wideToLong(df: DataFrame, stubnames: Seq[String], i: Seq[String],
      j: String, sep: String = ""): DataFrame = {
    val suffixes = df.columns.toSeq
      .filter(c => stubnames.exists(st => c.startsWith(st + sep) && c.length > (st + sep).length))
      .map(c => stubnames.collectFirst {
        case st if c.startsWith(st + sep) => c.drop((st + sep).length)
      }.get)
      .distinct.sorted
    require(suffixes.nonEmpty, s"no <stub>$sep<suffix> columns found for $stubnames")
    val rows = suffixes.map { sfx =>
      struct(lit(sfx).as(j) +: stubnames.map { st =>
        val c = s"$st$sep$sfx"
        (if (df.columns.contains(c)) col(c) else lit(null)).as(st)
      }: _*)
    }
    df.select(i.map(col) :+ explode(array(rows: _*)).as("__w2l"): _*)
      .select(i.map(col) ++ (j +: stubnames).map(c => col(s"__w2l.$c").as(c)): _*)
  }

  /** lreshape: groups maps each output column to the wide columns that
    * stack into it (reference melt.py:111). All groups must list equally
    * many columns; row k of each group zips together.
    */
  def lreshape(df: DataFrame, i: Seq[String], groups: Map[String, Seq[String]]): DataFrame = {
    val sizes = groups.values.map(_.size).toSet
    require(sizes.size == 1, s"unbalanced lreshape groups: $groups")
    val outCols = groups.keys.toSeq.sorted
    val rows = (0 until sizes.head).map { k =>
      struct(outCols.map(o => col(groups(o)(k)).as(o)): _*)
    }
    df.select(i.map(col) :+ explode(array(rows: _*)).as("__lr"): _*)
      .select(i.map(col) ++ outCols.map(c => col(s"__lr.$c").as(c)): _*)
  }

  /** pivot (no aggregation, reference pivot.py:379): like unstack but
    * FAILS on duplicate (index, column) pairs the way pandas raises
    * ValueError — first(value) would silently pick one. The check is one
    * extra count aggregate over the same grouping (cheap, same shuffle
    * key); callers that know uniqueness use unstack directly. */
  def pivotStrict(df: DataFrame, index: Seq[String], column: String,
      valueCol: String, pivotValues: Seq[String] = Nil): DataFrame = {
    val dups = df.groupBy((index :+ column).map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"pivot: duplicate entries for ${index :+ column} (e.g. ${dups.headOption})")
    unstack(df, index, column, valueCol, pivotValues)
  }

  /** transpose / df.T (reference: pandas/core/frame.py:2244 — numpy
    * .T over the whole block in RAM). The distributed re-expression:
    * melt every value column to (key, column, value) and unstack on the
    * key, so the result carries one output COLUMN per source ROW.
    * That is only meaningful when the row count is column-shaped —
    * stats blocks, describe() outputs, small aggregates — exactly the
    * frames pandas users actually transpose; the loud `maxCols` fence
    * (driver-side count before the pivot) keeps a fat fact table from
    * ever becoming a million-column plan. Values coerce to a common
    * type first (all-numeric → double, else string) — the reference's
    * object-dtype upcast under mixed columns.
    */
  def transpose(df: DataFrame, keyCol: String, maxCols: Int = 1000,
      columnName: String = "column"): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    val valueCols = df.columns.toSeq.filterNot(_ == keyCol)
    require(valueCols.nonEmpty, "transpose needs at least one value column")
    val allNumeric = df.schema.fields.filter(f => valueCols.contains(f.name))
      .forall(_.dataType.isInstanceOf[NumericType])
    val target = if (allNumeric) "double" else "string"
    // key values become column names: bounded, collected sorted for a
    // deterministic schema (one small job; the require is the fence)
    val keys = df.select(col(keyCol).cast(StringType)).distinct()
      .limit(maxCols + 1).collect().map(_.getString(0)).sorted.toSeq
    require(keys.size <= maxCols,
      s"transpose: > $maxCols distinct '$keyCol' values — a transposed " +
        "frame carries one column per source row; aggregate first")
    val melted = df.select(col(keyCol).cast(StringType).as("__k"),
      explode(array(valueCols.map(c =>
        struct(lit(c).as("c"), col(c).cast(target).as("v"))): _*)).as("__m"))
      .select(col("__k"), col("__m.c").as(columnName), col("__m.v").as("__v"))
    unstack(melted, Seq(columnName), "__k", "__v", keys)
  }

  /** unstack(level): pivot ONE index level of a multi-index long frame
    * into columns (reference reshape.py:31 _Unstacker), with fill_value.
    * `pivotValues` bounds the output schema; when empty Spark collects
    * the distinct level values first (two jobs — fine when the level's
    * cardinality is column-shaped, i.e. small; a 100 TB-safe caller
    * passes them explicitly).
    */
  def unstack(df: DataFrame, remainingIndex: Seq[String], level: String,
      valueCol: String, pivotValues: Seq[String] = Nil,
      fillValue: Option[Column] = None): DataFrame = {
    val g = df.groupBy(remainingIndex.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(level, pivotValues) else g.pivot(level)
    val wide = p.agg(first(col(valueCol)))
    fillValue match {
      case None => wide
      case Some(f) =>
        val vals = wide.columns.toSeq.filterNot(remainingIndex.contains)
        wide.select(remainingIndex.map(col) ++
          vals.map(c => coalesce(col(s"`$c`"), f).as(c)): _*)
    }
  }
}

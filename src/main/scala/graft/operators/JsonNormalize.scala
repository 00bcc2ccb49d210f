package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types._

/** json_normalize / nested_to_record (reference:
  * `pandas/io/json/normalize.py:96` json_normalize, `:26`
  * nested_to_record): semi-structured records → flat columns.
  *
  * Spark-first shape: nested JSON is already a first-class Catalyst
  * type (StructType/ArrayType after `spark.read.json` or `from_json`),
  * so flattening is a pure PROJECTION (`col("a.b").as("a.b")`) and
  * record-path expansion is a scan-local generator (`explode`) — both
  * zero-shuffle, fully codegen'd, and column-pruned down to the parquet
  * scan when the source is columnar. No driver-side dict walking at any
  * scale; the reference's recursive python flatten
  * (`nested_to_record`) is per-row interpreter work by construction.
  *
  * Matches the reference's naming contract: record fields keep their
  * plain names (optionally `recordPrefix`ed), meta columns get
  * `sep`-joined dotted paths; rows with an empty/missing record list
  * produce no output rows.
  */
object JsonNormalize {

  private def leafPaths(schema: StructType, prefix: Seq[String]): Seq[Seq[String]] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => leafPaths(s, prefix :+ f.name)
        case _ => Seq(prefix :+ f.name) // arrays/maps stay whole, as the
        // reference keeps lists un-flattened without a record_path
      }
    }

  /** nested_to_record: every nested struct leaf becomes a top-level
    * column named by its `sep`-joined path. */
  def flatten(df: DataFrame, sep: String = "."): DataFrame = {
    val cols = leafPaths(df.schema, Nil).map { path =>
      quoted(path).as(path.mkString(sep))
    }
    df.select(cols: _*)
  }

  private def quoted(path: Seq[String]): Column =
    col(path.map(p => s"`${p.replace("`", "``")}`").mkString("."))

  /** json_normalize with a record path: explode the array-of-struct at
    * `recordPath`, flatten each record, and carry `meta` columns from
    * the enclosing levels. */
  def normalize(df: DataFrame, recordPath: Seq[String],
      meta: Seq[Seq[String]] = Nil, sep: String = ".",
      recordPrefix: String = "", metaPrefix: String = ""): DataFrame = {
    require(recordPath.nonEmpty, "record path must have at least one key")
    val pathType = recordPath.foldLeft[DataType](df.schema) {
      case (s: StructType, key) =>
        s.find(_.name == key).getOrElse(throw new IllegalArgumentException(
          s"record path ${recordPath.mkString(sep)}: no field '$key' " +
            s"(has: ${s.fieldNames.mkString(", ")})")).dataType
      case (other, key) => throw new IllegalArgumentException(
        s"record path ${recordPath.mkString(sep)}: '$key' reached into " +
          s"non-struct $other")
    }
    val recSchema = pathType match {
      case ArrayType(s: StructType, _) => s
      case other => throw new IllegalArgumentException(
        s"record path ${recordPath.mkString(sep)} is $other — " +
          "expected an array of records")
    }
    val metaCols = meta.map(p =>
      quoted(p).as(metaPrefix + p.mkString(sep)))
    val exploded = df.select(
      metaCols :+ explode(quoted(recordPath)).as("__rec"): _*)
    val recCols = leafPaths(recSchema, Nil).map { path =>
      quoted("__rec" +: path).as(recordPrefix + path.mkString(sep))
    }
    exploded.select(recCols ++
      meta.map(p => col(s"`$metaPrefix${p.mkString(sep)}`")): _*)
  }
}

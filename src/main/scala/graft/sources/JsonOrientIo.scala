package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Date, Timestamp}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's read_json/to_json ORIENT family (reference:
  * `pandas/io/json/json.py:33` to_json with orient =
  * split|records|index|columns|values, `:38-49` the orient/option
  * validation, `pandas/io/json/table_schema.py:183`
  * build_table_schema for orient='table'). The lines=records case is
  * the data-lake path and already rides `spark.read.json`
  * (json_roundtrip); these orients are single-DOCUMENT encodings — a
  * config payload, an API response, a notebook export — so `read`
  * parses one document on the driver (256 MB loud guard) and
  * parallelizes the decoded rows, and `write` streams
  * `toLocalIterator` through a Jackson generator (constant driver
  * memory for every orient except `columns`, whose dict-of-dicts
  * layout is column-major by definition and buffers with a loud row
  * cap). Jackson ships inside Spark — zero added dependencies.
  *
  * Dates/datetimes are written ISO-8601 (the reference's
  * date_format='iso'; its 'epoch' default loses the type entirely).
  * orient='table' carries an explicit JSON-Table-Schema, so it is the
  * one orient that round-trips types exactly; the schemaless orients
  * re-infer from JSON native types (integral → long, any float →
  * double, bool, else string).
  */
object JsonOrientIo {

  private val MaxBytes = 256L << 20
  private val Orients = Set("split", "records", "index", "columns", "values", "table")
  private val IsoTs = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
  private val IsoTsMicro =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  // ms-aligned values keep the reference's 3-digit ISO form; sub-ms
  // precision emits all 6 digits instead of silently truncating (the
  // reader parses either via Timestamp.valueOf's variable fraction)
  private def fmtTs(ldt: java.time.LocalDateTime): String =
    if (ldt.getNano % 1000000 != 0) ldt.format(IsoTsMicro)
    else ldt.format(IsoTs)

  // --------------------------------------------------------------- write

  /** to_json: one document at `path` in the given orient. */
  def write(df: DataFrame, path: String, orient: String = "records",
      maxBufferedRows: Int = 1 << 20): Unit = {
    require(Orients(orient), s"unknown orient '$orient' (${Orients.mkString("|")})")
    val schema = df.schema
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20)
    val gen = new JsonFactory().createGenerator(out)
    def writeCell(row: Row, i: Int): Unit = {
      if (row.isNullAt(i)) { gen.writeNull(); return }
      schema(i).dataType match {
        case StringType => gen.writeString(row.getString(i))
        case LongType => gen.writeNumber(row.getLong(i))
        case IntegerType => gen.writeNumber(row.getInt(i).toLong)
        case ShortType => gen.writeNumber(row.getShort(i).toLong)
        case ByteType => gen.writeNumber(row.getByte(i).toLong)
        case BooleanType => gen.writeBoolean(row.getBoolean(i))
        case DoubleType =>
          val v = row.getDouble(i)
          if (v.isNaN || v.isInfinite) gen.writeNull() // JSON has no NaN;
          else gen.writeNumber(v) // the reference also writes null
        case FloatType =>
          val v = row.getFloat(i)
          if (v.isNaN || v.isInfinite) gen.writeNull()
          else gen.writeNumber(v)
        case _: DecimalType => gen.writeNumber(row.getDecimal(i))
        case DateType => gen.writeString(row.getDate(i).toString)
        case TimestampType => gen.writeString(
          fmtTs(row.getTimestamp(i).toLocalDateTime))
        case TimestampNTZType => gen.writeString(
          fmtTs(row.getAs[java.time.LocalDateTime](i)))
        case other => throw new IllegalArgumentException(
          s"to_json orient=$orient: unsupported type $other (${schema(i).name})")
      }
    }
    def rowObject(row: Row): Unit = {
      gen.writeStartObject()
      var i = 0
      while (i < schema.length) {
        gen.writeFieldName(schema(i).name); writeCell(row, i); i += 1
      }
      gen.writeEndObject()
    }
    def rowArray(row: Row): Unit = {
      gen.writeStartArray()
      var i = 0
      while (i < schema.length) { writeCell(row, i); i += 1 }
      gen.writeEndArray()
    }
    try {
      val it = df.toLocalIterator()
      orient match {
        case "records" =>
          gen.writeStartArray(); it.forEachRemaining(rowObject); gen.writeEndArray()
        case "values" =>
          gen.writeStartArray(); it.forEachRemaining(rowArray); gen.writeEndArray()
        case "split" =>
          gen.writeStartObject()
          gen.writeFieldName("columns"); gen.writeStartArray()
          schema.fieldNames.foreach(gen.writeString); gen.writeEndArray()
          gen.writeFieldName("data"); gen.writeStartArray()
          it.forEachRemaining(rowArray); gen.writeEndArray()
          gen.writeEndObject()
        case "index" =>
          gen.writeStartObject()
          var rn = 0L
          it.forEachRemaining { row =>
            gen.writeFieldName(rn.toString); rowObject(row); rn += 1
          }
          gen.writeEndObject()
        case "columns" =>
          // column-major by definition: buffer rows, loudly bounded
          val buf = scala.collection.mutable.ArrayBuffer[Row]()
          it.forEachRemaining { r =>
            require(buf.size < maxBufferedRows,
              s"to_json orient='columns' buffers the frame column-major; " +
                s">$maxBufferedRows rows — use orient='records' (streaming) " +
                "or json-lines at scale")
            buf += r
          }
          gen.writeStartObject()
          var i = 0
          while (i < schema.length) {
            gen.writeFieldName(schema(i).name)
            gen.writeStartObject()
            var rn = 0
            while (rn < buf.size) {
              gen.writeFieldName(rn.toString); writeCell(buf(rn), i); rn += 1
            }
            gen.writeEndObject()
            i += 1
          }
          gen.writeEndObject()
        case "table" =>
          gen.writeStartObject()
          gen.writeFieldName("schema")
          gen.writeStartObject()
          gen.writeFieldName("fields"); gen.writeStartArray()
          schema.fields.foreach { f =>
            gen.writeStartObject()
            gen.writeStringField("name", f.name)
            gen.writeStringField("type", tableType(f.dataType, f.name))
            gen.writeEndObject()
          }
          gen.writeEndArray()
          gen.writeStringField("pandas_version", "0.20.0")
          gen.writeEndObject()
          gen.writeFieldName("data"); gen.writeStartArray()
          it.forEachRemaining(rowObject); gen.writeEndArray()
          gen.writeEndObject()
      }
    } finally { gen.close(); out.close() }
  }

  /** JSON Table Schema type name (reference table_schema.py:22
    * as_json_table_type). DateType rides as 'datetime' (midnight):
    * pandas' own table-schema READER rejects the spec's 'date' type, so
    * emitting it would break the main interop target — our reader still
    * accepts 'date' from spec-compliant foreign producers. */
  private def tableType(dt: DataType, name: String): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType => "number"
    case BooleanType => "boolean"
    case StringType => "string"
    case TimestampType | TimestampNTZType | DateType => "datetime"
    case other => throw new IllegalArgumentException(
      s"orient='table': unsupported type $other ($name)")
  }

  // ---------------------------------------------------------------- read

  private def slurp(fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    require(len <= MaxBytes,
      s"$p is ${len >> 20} MB — orient documents are driver-parsed " +
        s"(limit ${MaxBytes >> 20} MB); use json-lines (spark.read.json) at scale")
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream(len.toInt)
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** read_json for a single orient document. */
  def read(spark: SparkSession, path: String, orient: String = "records"): DataFrame = {
    require(Orients(orient), s"unknown orient '$orient' (${Orients.mkString("|")})")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new ObjectMapper().readTree(slurp(fs, p))

    // decode to (names, explicit types or null, row cells as JsonNode)
    val (names, declared, rows): (Seq[String], Seq[DataType], Seq[Seq[JsonNode]]) =
      orient match {
        case "records" =>
          require(root.isArray, "orient='records': expected a JSON array")
          val names = firstSeenKeys(iter(root))
          (names, null, iter(root).map(o => names.map(o.get)))
        case "values" =>
          require(root.isArray, "orient='values': expected a JSON array")
          val n = if (root.size == 0) 0 else root.get(0).size
          ((0 until n).map(i => s"_c$i"), null,
            iter(root).map(a => (0 until n).map(a.get)))
        case "split" =>
          require(root.has("columns") && root.has("data"),
            "orient='split': expected {columns, data}")
          val names = iter(root.get("columns")).map(_.asText)
          (names, null,
            iter(root.get("data")).map(a => names.indices.map(a.get)))
        case "index" =>
          val names = firstSeenKeys(fields(root).map(_._2))
          (names, null, fields(root).map { case (_, o) => names.map(o.get) })
        case "columns" =>
          val cols = fields(root)
          val names = cols.map(_._1)
          val rowKeys = cols.headOption.map(c => fields(c._2).map(_._1))
            .getOrElse(Nil)
          (names, null, rowKeys.map(rk => cols.map(_._2.get(rk))))
        case "table" =>
          require(root.has("schema") && root.has("data"),
            "orient='table': expected {schema, data}")
          val flds = iter(root.get("schema").get("fields")).map { f =>
            (f.get("name").asText, f.get("type").asText)
          }.filterNot(_._1 == "index") // the reference writes the index in;
          // our frames are indexless, mirror its index=False reader path
          val names = flds.map(_._1)
          val types = flds.map {
            case (_, "integer") => LongType
            case (_, "number") => DoubleType
            case (_, "boolean") => BooleanType
            case (_, "string") => StringType
            case (_, "datetime") => TimestampType
            case (_, "date") => DateType
            case (n, t) => throw new IllegalArgumentException(
              s"orient='table': unsupported schema type '$t' for $n")
          }
          (names, types, iter(root.get("data")).map(o => names.map(o.get)))
      }

    val types: Seq[DataType] =
      if (declared != null) declared
      else names.indices.map(i => inferJson(rows.map(r => r(i))))

    val data = rows.map { cells =>
      Row.fromSeq(names.indices.map(i => convert(cells(i), types(i))))
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, data.size / 1000 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(data, slices), schema)
  }

  private def iter(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    n.elements().forEachRemaining(e => b += e)
    b.result()
  }

  private def fields(n: JsonNode): Seq[(String, JsonNode)] = {
    val b = Seq.newBuilder[(String, JsonNode)]
    n.properties().forEach(e => b += e.getKey -> e.getValue)
    b.result()
  }

  private def firstSeenKeys(objs: Seq[JsonNode]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    objs.foreach(o => o.fieldNames().forEachRemaining(seen.add))
    seen.toSeq
  }

  /** JSON-native whole-column inference: integral → long, any float →
    * double, bool, else string (the schemaless-orient dtype rule). */
  private def inferJson(cells: Seq[JsonNode]): DataType = {
    val present = cells.filter(c => c != null && !c.isNull)
    if (present.isEmpty) StringType
    else if (present.forall(c => c.isIntegralNumber && c.canConvertToLong))
      LongType // ints beyond int64 fall to double, the reference's lossy path
    else if (present.forall(_.isNumber)) DoubleType
    else if (present.forall(_.isBoolean)) BooleanType
    else if (present.forall(_.isTextual)) StringType
    else StringType
  }

  private def convert(c: JsonNode, dt: DataType): Any = {
    if (c == null || c.isNull) return null
    dt match {
      case LongType => c.asLong
      case DoubleType => c.asDouble
      case BooleanType => c.asBoolean
      case StringType => if (c.isTextual) c.asText else c.toString
      case DateType => Date.valueOf(LocalDate.parse(c.asText.take(10)))
      case TimestampType =>
        if (c.isNumber) new Timestamp(c.asLong) // reference 'epoch' ms
        else {
          val t = c.asText.replace('T', ' ').stripSuffix("Z")
          Timestamp.valueOf(if (t.contains(' ')) t else s"$t 00:00:00")
        }
    }
  }
}

package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.sources.JsonOrientIo
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** read_json/to_json orient family (reference: pandas/io/json/json.py:33,
  * table_schema.py:183). orient='table' round-trips types exactly via
  * its embedded schema; the schemaless orients re-infer from JSON
  * native types. pandas-written fixtures pin the foreign-producer
  * direction (recipe: src/test/resources/README.md). */
class JsonOrientSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("json-orient").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getPath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("x", DoubleType),
    StructField("s", StringType), StructField("b", BooleanType),
    StructField("d", DateType), StructField("ts", TimestampType)))
  private def frame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 1.5, "a \"q\" é", true, Date.valueOf("2024-02-29"),
        Timestamp.valueOf("2024-02-29 12:34:56.789")),
      Row(2L, -0.25, "plain", false, Date.valueOf("1959-06-01"),
        Timestamp.valueOf("1969-12-31 23:59:59.5")),
      Row(3L, null, null, null, null, null)), 2), schema)

  test("orient='table' round-trips types via the embedded JSON Table " +
      "Schema (dates ride as midnight datetimes — pandas' reader " +
      "rejects the spec's 'date' type)") {
    import org.apache.spark.sql.functions.col
    val p = tmp("t.json")
    JsonOrientIo.write(frame, p, orient = "table")
    val back = JsonOrientIo.read(spark, p, orient = "table")
    val expected = frame.withColumn("d", col("d").cast("timestamp"))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      expected.schema.map(f => (f.name, f.dataType)), back.schema.treeString)
    assertFrameEqual(back, expected)
  }

  test("sub-millisecond timestamps emit 6 fractional digits and " +
      "round-trip through orient='table'") {
    import org.apache.spark.sql.types._
    val micro = Timestamp.valueOf("2024-02-29 12:34:56.123456")
    val milli = Timestamp.valueOf("2024-02-29 12:34:56.789")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, micro), Row(2L, milli))),
      StructType(Seq(StructField("k", LongType),
        StructField("ts", TimestampType))))
    val p = tmp("micro.json")
    JsonOrientIo.write(df, p, orient = "table")
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    // µs value keeps all 6 digits; ms-aligned value keeps the 3-digit form
    assert(text.contains("12:34:56.123456") && text.contains("12:34:56.789\""),
      text.take(400))
    val back = JsonOrientIo.read(spark, p, orient = "table")
    assertFrameEqual(back, df)
  }

  test("schemaless orients round-trip values with JSON-native type " +
      "inference (temporals come back as ISO strings)") {
    for (orient <- Seq("records", "values", "split", "index", "columns")) {
      val p = tmp(s"$orient.json")
      JsonOrientIo.write(frame, p, orient)
      val back = JsonOrientIo.read(spark, p, orient)
      val expectNames =
        if (orient == "values") Seq("_c0", "_c1", "_c2", "_c3", "_c4", "_c5")
        else schema.fieldNames.toSeq
      assert(back.schema.fieldNames.toSeq == expectNames, s"$orient names")
      assert(back.schema.fields.map(_.dataType).toSeq ==
        Seq(LongType, DoubleType, StringType, BooleanType,
          StringType, StringType), s"$orient: ${back.schema.treeString}")
      val got = back.collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(4)))).toSet
      assert(got == Set(
        (1L, Some(1.5), Some("a \"q\" é"), Some("2024-02-29")),
        (2L, Some(-0.25), Some("plain"), Some("1959-06-01")),
        (3L, None, None, None)), s"$orient: $got")
    }
  }

  test("columns orient buffers with a loud row cap; unknown orient and " +
      "malformed documents are loud") {
    import spark.implicits._
    val big = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException](
      JsonOrientIo.write(big, tmp("cap.json"), "columns", maxBufferedRows = 10))
    assert(e1.getMessage.contains("buffers"), e1.getMessage)

    val e2 = intercept[IllegalArgumentException](
      JsonOrientIo.write(big, tmp("o.json"), "sideways"))
    assert(e2.getMessage.contains("unknown orient"), e2.getMessage)

    val p = tmp("bad.json")
    Files.write(java.nio.file.Paths.get(p), "[1, 2]".getBytes)
    val e3 = intercept[Exception](JsonOrientIo.read(spark, p, "split"))
    assert(e3.getMessage.contains("split"), e3.getMessage)
  }

  test("pandas-written orient fixtures read back (foreign producer: " +
      "epoch-ms datetimes in records, index keys out of order)") {
    def res(name: String): String = getClass.getResource(s"/$name").getPath
    val rec = JsonOrientIo.read(spark, res("fixture_records.json"), "records")
    assert(rec.schema.fieldNames.toSeq == Seq("a", "s", "t"))
    // pandas default date_format='epoch' writes datetimes as ms numbers —
    // they arrive as long, the reference's own lossy default
    assert(rec.schema.fields.map(_.dataType).toSeq ==
      Seq(LongType, StringType, LongType))
    assert(rec.count() == 3)
    val spl = JsonOrientIo.read(spark, res("fixture_split.json"), "split")
    assert(spl.schema.fieldNames.toSeq == Seq("a", "s", "t"))
    val tbl = JsonOrientIo.read(spark, res("fixture_table.json"), "table")
    assert(tbl.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("a", LongType), ("s", StringType), ("t", TimestampType)),
      tbl.schema.treeString)
    assert(tbl.where(tbl("a") === 2).collect()(0).getTimestamp(2) ==
      Timestamp.valueOf("2020-06-01 08:30:00"))
  }
}

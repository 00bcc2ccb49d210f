package graft

import graft.operators.JsonNormalize
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** json_normalize/nested_to_record (reference: pandas/io/json/
  * normalize.py:96, :26): record fields keep plain names, meta columns
  * get sep-joined dotted paths, empty/missing record lists drop rows —
  * checked against pandas.json_normalize on the same literal data. */
class JsonNormalizeSpec extends SparkSpec {

  private val nested = {
    val rec = StructType(Seq(StructField("name", StringType),
      StructField("pop", LongType)))
    val info = StructType(Seq(StructField("governor", StringType)))
    val schema = StructType(Seq(
      StructField("state", StringType),
      StructField("info", info),
      StructField("counties", ArrayType(rec))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("FL", Row("Rick"), Seq(Row("Dade", 12345L), Row("Broward", 40000L))),
        Row("OH", Row("John"), Seq(Row("Summit", 1234L))),
        Row("NV", Row("Brian"), Seq.empty[Row]),
        Row("WY", null, null)), 2), schema)
  }

  test("flatten: every struct leaf becomes a dotted top-level column; " +
      "arrays stay whole without a record path") {
    val flat = JsonNormalize.flatten(nested)
    assert(flat.schema.fieldNames.toSeq ==
      Seq("state", "info.governor", "counties"))
    val flat2 = JsonNormalize.flatten(nested, sep = "_")
    assert(flat2.schema.fieldNames.toSeq ==
      Seq("state", "info_governor", "counties"))
    assert(flat.where(flat("state") === "FL").collect()(0).getString(1) == "Rick")
  }

  test("normalize: record fields first with plain names, dotted meta " +
      "after; empty and null record lists produce no rows") {
    val out = JsonNormalize.normalize(nested, Seq("counties"),
      meta = Seq(Seq("state"), Seq("info", "governor")))
    // pandas: json_normalize(data, 'counties', ['state', ['info','governor']])
    // → columns name, pop, state, info.governor; NV (empty) and WY
    // (missing) contribute no rows
    assert(out.schema.fieldNames.toSeq ==
      Seq("name", "pop", "state", "info.governor"))
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("Dade", 12345L, "FL", "Rick"), ("Broward", 40000L, "FL", "Rick"),
      ("Summit", 1234L, "OH", "John")), got.toString)
  }

  test("prefixes and loud failures: record/meta prefixes apply; bad " +
      "paths and non-record arrays throw with the path named") {
    val out = JsonNormalize.normalize(nested, Seq("counties"),
      meta = Seq(Seq("state")), recordPrefix = "c_", metaPrefix = "m_")
    assert(out.schema.fieldNames.toSeq == Seq("c_name", "c_pop", "m_state"))

    val e1 = intercept[IllegalArgumentException](
      JsonNormalize.normalize(nested, Seq("nope")))
    assert(e1.getMessage.contains("no field 'nope'"), e1.getMessage)

    val e2 = intercept[IllegalArgumentException](
      JsonNormalize.normalize(nested, Seq("state")))
    assert(e2.getMessage.contains("expected an array"), e2.getMessage)
  }
}

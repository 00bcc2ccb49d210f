package graft

import graft.sources.FwfReader
import java.nio.file.Files

/** read_fwf: explicit colspecs, per-file header skip, and pandas-style
  * colspec inference from blank columns. */
class FwfSpec extends SparkSpec {

  private def writeFwf(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-fwf", ".txt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("explicit colspecs with types and header skip") {
    val path = writeFwf(Seq(
      "id   name      qty",
      "1    alpha     10 ",
      "22   beta r    7  ",
      "333  gamma     123"))
    val df = FwfReader.read(spark, path, Seq(
      ("id", 0, 5, "int"), ("name", 5, 15, "string"), ("qty", 15, 18, "int")),
      skipHeader = true)
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1, "alpha", 10), (22, "beta r", 7), (333, "gamma", 123)))
  }

  test("write round-trips types and renders nulls as blank fields") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("s", StringType),
      StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123")
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 1.5, "alpha", ts),
        Row(22L, null, "b", null),
        Row(333L, -0.25, "gamma", ts))),
      schema)
    val dir = Files.createTempDirectory("graft-fwf-rt").toString + "/out"
    val specs = FwfReader.write(in, dir)
    assert(specs.map(_._1) == Seq("k", "v", "s", "ts"))
    val back = FwfReader.read(spark, dir, specs)
    assert(back.schema.map(_.dataType) == in.schema.map(_.dataType))
    val rows = back.collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(rows == Set(
      (1L, 1.5, "alpha", ts),
      (22L, null, "b", null),
      (333L, -0.25, "gamma", ts)))
  }

  test("inferColspecs finds blank-separated columns") {
    val path = writeFwf(Seq(
      "1    alpha     10",
      "22   beta      7 ",
      "333  gamma     12"))
    val specs = FwfReader.inferColspecs(spark, path)
    assert(specs == Seq((0, 3), (5, 10), (15, 17)))
  }
}

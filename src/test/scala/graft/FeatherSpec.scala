package graft

import java.nio.file.Files

import graft.sources.FeatherIo
import org.apache.spark.sql.functions._

/** read_feather / to_feather round-trips (reference
  * pandas/io/feather_format.py:87,37). No feather fixtures exist in the
  * oracle corpus, so coverage is self-round-trip: write with our IPC
  * writer, read back distributed, compare frames. */
class FeatherSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("feather").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  test("round-trip: long/int/double/string/boolean with nulls") {
    val df = Seq(
      (1L, Some(10), Some(1.5), Some("alpha"), Some(true)),
      (2L, None, Some(-2.25), None, Some(false)),
      (3L, Some(-7), None, Some("gamma"), None),
      (4L, Some(0), Some(0.0), Some(""), Some(true)))
      .toDF("id", "i", "d", "s", "b")
      .select(col("id"), col("i").cast("int"), col("d"), col("s"), col("b"))
    val path = tmp("basic.feather")
    FeatherIo.write(df, path)
    val back = FeatherIo.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assertFrameEqual(back, df)
  }

  test("round-trip: timestamp and date survive at microsecond/day precision") {
    val df = Seq(
      (1L, "2024-01-15 10:30:00.123456", "2024-01-15"),
      (2L, "1999-12-31 23:59:59.999999", "1999-12-31"),
      (3L, "2024-06-01 00:00:00", "2024-06-01"))
      .toDF("id", "ts_s", "dt_s")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"),
        col("dt_s").cast("date").as("dt"))
    val path = tmp("temporal.feather")
    FeatherIo.write(df, path)
    assertFrameEqual(FeatherIo.read(spark, path), df)
  }

  test("multi-batch files read one task per record batch") {
    val df = spark.range(100).select(col("id"),
      (col("id") * 2).as("dbl"), concat(lit("row"), col("id")).as("tag"))
    val path = tmp("batched.feather")
    FeatherIo.write(df, path, batchSize = 16)
    val back = FeatherIo.read(spark, path)
    // 100 rows at 16/batch = 7 record batches = 7 input partitions
    assert(back.rdd.getNumPartitions == 7, s"${back.rdd.getNumPartitions}")
    assertFrameEqual(back, df)
  }

  test("empty frame round-trips schema") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val path = tmp("empty.feather")
    FeatherIo.write(df, path)
    val back = FeatherIo.read(spark, path)
    assert(back.count() == 0)
    assert(back.schema.map(_.name) == Seq("id", "s"))
  }
}

package graft

import graft.sources.JdbcIo
import org.apache.spark.sql.SaveMode

/** read_sql/to_sql: option-construction rules, plus a REAL round trip
  * against embedded Derby (ships in /opt/spark/jars) — the same engine
  * the jdbc_roundtrip gate query pushes through the DuckDB oracle. */
class JdbcIoSpec extends SparkSpec {

  test("read option map: table vs query, partitioned-scan options") {
    val t = JdbcIo.readOptions("jdbc:postgresql://db/x", table = Some("events"))
    assert(t("dbtable") == "events" && !t.contains("query"))
    assert(t("fetchsize") == "10000")

    val q = JdbcIo.readOptions("jdbc:postgresql://db/x",
      query = Some("SELECT 1"), fetchSize = 500)
    assert(q("query") == "SELECT 1" && !q.contains("dbtable"))
    assert(q("fetchsize") == "500")

    val p = JdbcIo.readOptions("jdbc:postgresql://db/x", table = Some("events"),
      partitioning = Some(JdbcIo.Partitioning("event_id", 0L, 1000000L, 32)))
    assert(p("partitionColumn") == "event_id" && p("numPartitions") == "32")
    assert(p("lowerBound") == "0" && p("upperBound") == "1000000")

    intercept[IllegalArgumentException] {
      JdbcIo.readOptions("u", table = Some("t"), query = Some("q"))
    }
    intercept[IllegalArgumentException] { JdbcIo.readOptions("u") }
    intercept[IllegalArgumentException] {
      JdbcIo.readOptions("u", query = Some("q"),
        partitioning = Some(JdbcIo.Partitioning("c", 0, 10, 2)))
    }
    intercept[IllegalArgumentException] { JdbcIo.Partitioning("c", 10, 10, 2) }
    intercept[IllegalArgumentException] { JdbcIo.Partitioning("c", 0, 10, 0) }
  }

  test("to_sql if_exists maps to SaveMode") {
    assert(JdbcIo.saveMode("fail") == SaveMode.ErrorIfExists)
    assert(JdbcIo.saveMode("replace") == SaveMode.Overwrite)
    assert(JdbcIo.saveMode("append") == SaveMode.Append)
    intercept[IllegalArgumentException] { JdbcIo.saveMode("upsert") }
  }

  test("readSql reaches JDBC driver resolution (no driver in env)") {
    val e = intercept[Exception] {
      JdbcIo.readSql(spark, "jdbc:nosuchdb://nowhere/x", table = Some("t"))
    }
    // Spark's JDBC source fails at driver lookup — proof the options
    // reached the real source rather than silently no-opping
    assert(e.toString.toLowerCase.contains("driver")
      || e.toString.toLowerCase.contains("jdbc"), e.toString)
  }

  test("to_sql/read_sql round trip against embedded Derby, " +
      "if_exists semantics, partitioned read") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("derby-spec")
    System.setProperty("derby.stream.error.file",
      dir.resolve("derby.log").toString)
    val url = s"jdbc:derby:$dir/db;create=true"
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25), (3L, null, 0.0))
      .toDF("k", "s", "v")

    JdbcIo.toSql(df, url, "T1") // if_exists='fail' on a fresh table
    assertFrameEqual(JdbcIo.readSql(spark, url, table = Some("T1")), df)

    // fail on existing; replace drops and recreates; append accumulates
    intercept[Exception] { JdbcIo.toSql(df, url, "T1", ifExists = "fail") }
    JdbcIo.toSql(df.filter(col("k") < 3), url, "T1", ifExists = "replace")
    assert(JdbcIo.readSql(spark, url, table = Some("T1")).count() == 2)
    JdbcIo.toSql(df.filter(col("k") === 3), url, "T1", ifExists = "append")
    assertFrameEqual(JdbcIo.readSql(spark, url, table = Some("T1")), df)

    // partitioned read: 4 range slices on k cover all rows exactly once
    val part = JdbcIo.readSql(spark, url, table = Some("T1"),
      partitioning = Some(JdbcIo.Partitioning("k", 0L, 4L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assertFrameEqual(part, df)
  }
}

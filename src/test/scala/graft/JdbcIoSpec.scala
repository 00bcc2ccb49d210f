package graft

import graft.sources.JdbcIo
import org.apache.spark.sql.SaveMode

/** read_sql/to_sql plumbing — no database exists in this environment, so
  * these validate the option construction rules and that a read reaches
  * JDBC driver resolution (proving the plan is wired to the real source,
  * not a stub). */
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
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** read_sql / to_sql passthrough (reference: pandas/io/sql.py:315
  * read_sql, :397 to_sql) over Spark's JDBC source.
  *
  * The reference streams a whole result set through one connection; the
  * 100 TB-shaped read is Spark's partitioned JDBC scan — numPartitions
  * concurrent range queries on an indexed column, each executor pulling
  * its own slice (partitionColumn/lowerBound/upperBound map to
  * `WHERE col >= x AND col < y` per task). Filters and column pruning
  * push into the generated SQL via the JDBC source's own pushdown.
  *
  * The build environment has no database (and no egress), so the specs
  * validate option plumbing and the reader reaching JDBC driver
  * resolution — the semantics on a live DB are Spark's own, not re-shipped
  * here.
  */
object JdbcIo {

  /** Partitioned-scan spec: `numPartitions` range slices of `column`
    * over [lower, upper) — the difference between a single-connection
    * read and a parallel one. */
  final case class Partitioning(column: String, lower: Long, upper: Long,
      numPartitions: Int) {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    require(upper > lower, s"empty bound range: [$lower, $upper)")
  }

  /** Option map for a JDBC read: exactly one of `table` or `query`. */
  def readOptions(url: String, table: Option[String] = None,
      query: Option[String] = None, partitioning: Option[Partitioning] = None,
      fetchSize: Int = 10000, extra: Map[String, String] = Map.empty)
      : Map[String, String] = {
    require(table.isDefined ^ query.isDefined,
      "read_sql needs exactly one of table or query")
    require(fetchSize >= 1, s"fetchSize must be >= 1: $fetchSize")
    require(partitioning.isEmpty || query.isEmpty,
      "partitioned reads need a table (Spark restriction: no query + partitionColumn)")
    val base = Map("url" -> url, "fetchsize" -> fetchSize.toString) ++
      table.map("dbtable" -> _) ++ query.map("query" -> _)
    val parts = partitioning.map { p =>
      Map("partitionColumn" -> p.column,
        "lowerBound" -> p.lower.toString,
        "upperBound" -> p.upper.toString,
        "numPartitions" -> p.numPartitions.toString)
    }.getOrElse(Map.empty)
    base ++ parts ++ extra
  }

  /** read_sql_table / read_sql_query. */
  def readSql(spark: SparkSession, url: String, table: Option[String] = None,
      query: Option[String] = None, partitioning: Option[Partitioning] = None,
      fetchSize: Int = 10000, extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(readOptions(url, table, query, partitioning, fetchSize, extra))
      .load()

  /** to_sql: if_exists='fail'|'replace'|'append' → SaveMode. */
  def saveMode(ifExists: String): SaveMode = ifExists match {
    case "fail" => SaveMode.ErrorIfExists
    case "replace" => SaveMode.Overwrite
    case "append" => SaveMode.Append
    case other => throw new IllegalArgumentException(
      s"if_exists must be fail|replace|append: $other")
  }

  def toSql(df: DataFrame, url: String, table: String,
      ifExists: String = "fail", batchSize: Int = 10000,
      extra: Map[String, String] = Map.empty): Unit = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    df.write.format("jdbc").mode(saveMode(ifExists))
      .options(Map("url" -> url, "dbtable" -> table,
        "batchsize" -> batchSize.toString) ++ extra)
      .save()
  }
}

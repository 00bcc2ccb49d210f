package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qmod}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every registered operator query from
  * the per-family modules under `graft.queries`.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    qmod.CoreQueries,
    qmod.SelectionQueries,
    qmod.JoinQueries,
    qmod.GroupByQueries,
    qmod.WindowQueries,
    qmod.ResampleQueries,
    qmod.AsofQueries,
    qmod.StringQueries,
    qmod.DatetimeQueries,
    qmod.ReshapeQueries,
    qmod.LlmQueries,
    qmod.ExtrasQueries,
    qmod.MomentQueries,
    qmod.SessionRangeQueries,
    qmod.AlignQueries,
    qmod.SetOpQueries,
    qmod.MissingQueries,
    qmod.ApplyQueries,
    qmod.OffsetQueries,
    qmod.IoQueries,
    qmod.MergeQueries,
    qmod.FrameCompareQueries
  )

  private lazy val all: Seq[QueryDef] = {
    val defs = modules.flatMap(_.defs)
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names would shadow: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qmod.CoreQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet footer MANIFEST — the Iceberg/Delta metadata idea without a
  * table format: one row per (file, column) holding the footer's
  * row count, null count, and min/max, built WITHOUT reading any data
  * pages. A 100 TB table's manifest is a few MB; planning a selective
  * scan against the manifest touches metadata only, then reads just
  * the files that can contain matches — the step between "read the
  * directory" and "read nothing", and the same skipping the
  * sorted/z-ordered layouts set up, made explicit and queryable.
  *
  * Footers are read DISTRIBUTED: the file list parallelizes across
  * executors (manifest build cost scales with file count / cluster
  * width, not data volume). v1 records stats for INTEGER-typed
  * (int32/int64) columns — the usual pruning keys (ids, timestamps
  * stored as micros); other types appear with NULL stats so callers
  * can see they are unindexed rather than silently unprunable. */
object Manifest {

  case class ColStats(file: String, column: String, rows: Long,
      nulls: Long, min: Option[Long], max: Option[Long])

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.startsWith("part-"))
      .map(_.toString)
  }

  /** Build the manifest for every `part-` file under `dir`. */
  def build(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Manifest.build: need at least one column")
    import spark.implicits._
    val files = dataFiles(spark, dir)
    require(files.nonEmpty, s"Manifest.build: no part- files under $dir")
    val want = cols.toSet
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { it =>
        // executor-local default Hadoop conf: footer reads only need
        // the filesystem, which the path URI selects
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f), conf))
          try {
            // (rows, nulls, min, max, every-row-group-had-stats): one
            // row group WITHOUT stats must poison the file's min/max
            // to None — folding it into the other groups' bounds
            // would let prunedRead skip rows that group may contain
            val perCol = scala.collection.mutable.Map[String,
              (Long, Long, Option[Long], Option[Long], Boolean)]()
            reader.getRowGroups.asScala.foreach { rg =>
              rg.getColumns.asScala.foreach { c =>
                val name = c.getPath.toDotString
                if (want.contains(name)) {
                  val st = c.getStatistics
                  val rows = rg.getRowCount
                  val nulls = if (st == null) 0L else st.getNumNulls
                  val mm: (Option[Long], Option[Long]) = st match {
                    case s: org.apache.parquet.column.statistics
                        .LongStatistics if !s.isEmpty =>
                      (Some(s.getMin), Some(s.getMax))
                    case s: org.apache.parquet.column.statistics
                        .IntStatistics if !s.isEmpty =>
                      (Some(s.getMin.toLong), Some(s.getMax.toLong))
                    case _ => (None, None)
                  }
                  val prev = perCol.getOrElse(name,
                    (0L, 0L, Option.empty[Long], Option.empty[Long], true))
                  perCol(name) = (prev._1 + rows, prev._2 + nulls,
                    minOpt(prev._3, mm._1), maxOpt(prev._4, mm._2),
                    prev._5 && mm._1.isDefined)
                }
              }
            }
            want.toSeq.sorted.map { c =>
              val (r, n, mn, mx, allStats) =
                perCol.getOrElse(c, (0L, 0L, Option.empty[Long],
                  Option.empty[Long], true))
              if (allStats) ColStats(f, c, r, n, mn, mx)
              else ColStats(f, c, r, n, None, None)
            }
          } finally reader.close()
        }
      }
      .toDF()
  }

  private def minOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a ++ b).reduceOption(_ min _)
  private def maxOpt(a: Option[Long], b: Option[Long]): Option[Long] =
    (a ++ b).reduceOption(_ max _)

  /** Range-pruned read: consult `manifest` for the files whose
    * [min, max] on `column` intersects [lo, hi] (files with NULL
    * stats are conservatively KEPT — unindexed must not mean
    * invisible), read only those, and apply the residual filter.
    * The manifest collect is bounded by the file count — the planning
    * data, not the data. */
  def prunedRead(spark: SparkSession, manifest: DataFrame,
      column: String, lo: Long, hi: Long): DataFrame = {
    val keep = manifest
      .filter(col("column") === column)
      .filter(col("min").isNull || col("max").isNull ||
        !(col("max") < lo || col("min") > hi))
      .select("file").distinct()
      .collect().map(_.getString(0)) // bounded: file paths only
    if (keep.nonEmpty)
      spark.read.parquet(keep.toIndexedSeq: _*)
        .filter(col(column) >= lo && col(column) <= hi)
    else {
      // every file provably misses the range: an EMPTY result with
      // the table's schema (read zero rows of any one file), not an
      // error — an empty slice is a legitimate answer
      val any = manifest.select("file").limit(1).collect()
      require(any.nonEmpty, "prunedRead: empty manifest")
      spark.read.parquet(any(0).getString(0)).limit(0)
        .filter(col(column) >= lo && col(column) <= hi)
    }
  }
}

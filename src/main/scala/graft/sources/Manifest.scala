package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
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
  * width, not data volume), and the executors read under the JOB's
  * Hadoop configuration (broadcast — object-store credentials and
  * fs.* settings arrive via spark.hadoop.*; a default Configuration
  * would drop them on exactly the 100 TB deployment this targets).
  *
  * v2 stats cover the real pruning keys: int32/int64 (`min`/`max`),
  * float/double (`min_d`/`max_d`), and UTF-8 strings
  * (`min_s`/`max_s`, truncated to [[Manifest.StringStatCap]] chars —
  * lower bounds truncate plainly; upper bounds truncate-and-increment
  * so they remain valid upper bounds, the Iceberg convention). Other
  * types appear with NULL stats so callers can see they are
  * unindexed rather than silently unprunable. A null count is NULL
  * when any row group omitted it (parquet writers may skip num_nulls;
  * a -1 sentinel must read as unknown, not as a count). */
object Manifest {

  /** Truncation cap for string min/max — long URL/text keys would
    * otherwise bloat a metadata-only artifact. */
  val StringStatCap = 64

  case class ColStats(file: String, column: String, rows: Long,
      nulls: Option[Long], min: Option[Long], max: Option[Long],
      min_d: Option[Double], max_d: Option[Double],
      min_s: Option[String], max_s: Option[String])

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.startsWith("part-"))
      .map(_.toString)
  }

  /** A truncated string is a valid LOWER bound as-is (prefixes sort
    * before their extensions). */
  private[graft] def truncLower(s: String): String =
    if (s.length <= StringStatCap) s else s.substring(0, StringStatCap)

  /** A truncated string is NOT a valid upper bound — increment the
    * last incrementable code unit of the kept prefix (the Iceberg
    * upper-bound convention); None if no unit is incrementable
    * (poison → unprunable, conservative).
    *
    * Incrementable means the unit AND its successor are plain
    * non-surrogate scalars: incrementing into (or from within) the
    * surrogate range would leave an unpaired surrogate, which
    * Catalyst's UTF-8 encoder rewrites to '?' (0x3F) — a bound that
    * is byte-wise SMALLER than the data it must dominate, silently
    * pruning files that contain matching rows (row LOSS, not
    * over-scan — the one failure a residual filter cannot repair).
    * Code-point-monotonic UTF-8 makes the per-unit increment valid
    * under the UTF-8 byte order parquet stats and Spark's UTF8String
    * comparisons both use. */
  private[graft] def truncUpper(s: String): Option[String] =
    if (s.length <= StringStatCap) Some(s)
    else {
      val p = s.substring(0, StringStatCap).toCharArray
      def ok(c: Char): Boolean = c != Char.MaxValue &&
        !Character.isSurrogate(c) && !Character.isSurrogate((c + 1).toChar)
      var i = p.length - 1
      while (i >= 0 && !ok(p(i))) i -= 1
      if (i < 0) None
      else Some(new String(p, 0, i) + (p(i) + 1).toChar)
    }

  // One row group's usable stats, by physical type
  private sealed trait Mm
  private case class MmL(mn: Long, mx: Long) extends Mm
  private case class MmD(mn: Double, mx: Double) extends Mm
  private case class MmS(mn: String, mx: String) extends Mm
  private case object MmNone extends Mm

  private final class Acc {
    var rows = 0L
    var nulls = 0L
    var nullsKnown = true
    var allStats = true
    var l: Option[(Long, Long)] = None
    var d: Option[(Double, Double)] = None
    var s: Option[(String, String)] = None
  }

  /** Build the manifest for every `part-` file under `dir`. */
  def build(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    val files = dataFiles(spark, dir)
    require(files.nonEmpty, s"Manifest.build: no part- files under $dir")
    buildFiles(spark, files, cols)
  }

  /** INCREMENTAL maintenance — the nightly-ingest path: footer-read
    * only the files under `dir` that `manifest` does not already
    * cover, union their stats with the carried-forward rows, and drop
    * rows for files that no longer exist (compaction/vacuum). A
    * steady-state lake pays footer I/O proportional to the DELTA, not
    * the table; the file-list reconciliation is bounded by file count
    * (manifest metadata, not table data). Returns the new manifest —
    * the caller persists it wherever the old one lived. The stat
    * columns tracked must match the original build's `cols` (stats
    * for a column the old manifest never recorded would silently
    * exist for new files only and prune wrongly — same-cols is the
    * caller's contract, checked against the carried rows). */
  def update(spark: SparkSession, dir: String, manifest: DataFrame,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val current = dataFiles(spark, dir)
    require(current.nonEmpty, s"Manifest.update: no part- files under $dir")
    val old = manifest.select("column").distinct()
      .collect().map(_.getString(0)).toSet // bounded: tracked columns
    require(old == cols.toSet,
      s"Manifest.update: cols ${cols.sorted} != manifest's ${old.toSeq.sorted}")
    // file-list reconciliation as JOINS, not plan literals: an isin of
    // 100k file-path strings is the plan-bloat pathology the PQ
    // broadcast-codebook fix documents. Only the DELTA is collected
    // (the rows buildFiles needs driver-side).
    val currentDf = spark.createDataset(current).toDF("file")
    val added = currentDf
      .join(manifest.select("file").distinct(), Seq("file"), "left_anti")
      .collect().map(_.getString(0)).toSeq // bounded: the delta's paths
    val kept = manifest.join(broadcast(currentDf), Seq("file"), "left_semi")
    if (added.isEmpty) kept
    else kept.unionByName(buildFiles(spark, added, cols))
  }

  private def buildFiles(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Manifest: need at least one column")
    import spark.implicits._
    val want = cols.toSet
    // the JOB conf, not a classpath-default Configuration: S3A/ABFS
    // credentials and custom fs.* schemes ride spark.hadoop.* and
    // must reach the executor-side footer opens (WetIo idiom)
    val bConf = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { it =>
        val conf = bConf.value.value
        it.flatMap { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f), conf))
          try {
            // one row group WITHOUT stats must poison the file's
            // min/max to None — folding it into the other groups'
            // bounds would let prunedRead skip rows it may contain
            val perCol = scala.collection.mutable.Map[String, Acc]()
            reader.getRowGroups.asScala.foreach { rg =>
              rg.getColumns.asScala.foreach { c =>
                val name = c.getPath.toDotString
                if (want.contains(name)) {
                  val st = c.getStatistics
                  val mm: Mm =
                    if (st == null || !st.hasNonNullValue) MmNone
                    else st match {
                      case s: org.apache.parquet.column.statistics
                          .LongStatistics => MmL(s.getMin, s.getMax)
                      case s: org.apache.parquet.column.statistics
                          .IntStatistics =>
                        MmL(s.getMin.toLong, s.getMax.toLong)
                      case s: org.apache.parquet.column.statistics
                          .DoubleStatistics => MmD(s.getMin, s.getMax)
                      case s: org.apache.parquet.column.statistics
                          .FloatStatistics =>
                        MmD(s.getMin.toDouble, s.getMax.toDouble)
                      case s: org.apache.parquet.column.statistics
                          .BinaryStatistics =>
                        MmS(new String(s.getMinBytes, UTF_8),
                          new String(s.getMaxBytes, UTF_8))
                      case _ => MmNone
                    }
                  val a = perCol.getOrElseUpdate(name, new Acc)
                  a.rows += rg.getRowCount
                  // writers may omit num_nulls; the API's -1 sentinel
                  // is "unknown", never a count
                  if (st != null && st.isNumNullsSet && st.getNumNulls >= 0)
                    a.nulls += st.getNumNulls
                  else a.nullsKnown = false
                  mm match {
                    case MmL(mn, mx) => a.l = Some(a.l.fold((mn, mx))(p =>
                      (p._1 min mn, p._2 max mx)))
                    case MmD(mn, mx) => a.d = Some(a.d.fold((mn, mx))(p =>
                      (p._1 min mn, p._2 max mx)))
                    case MmS(mn, mx) => a.s = Some(a.s.fold((mn, mx))(p =>
                      (if (p._1 <= mn) p._1 else mn,
                       if (p._2 >= mx) p._2 else mx)))
                    case MmNone => a.allStats = false
                  }
                }
              }
            }
            want.toSeq.sorted.map { c =>
              perCol.get(c) match {
                case Some(a) if a.allStats =>
                  val su = a.s.flatMap(p => truncUpper(p._2))
                  ColStats(f, c, a.rows,
                    if (a.nullsKnown) Some(a.nulls) else None,
                    a.l.map(_._1), a.l.map(_._2),
                    a.d.map(_._1), a.d.map(_._2),
                    // upper-bound truncation can poison: then BOTH
                    // bounds drop (a one-sided bound would still
                    // prune, but keeping the pair honest is simpler
                    // and the cap makes this vanishingly rare)
                    a.s.map(p => truncLower(p._1)).filter(_ => su.isDefined),
                    su)
                case Some(a) =>
                  ColStats(f, c, a.rows,
                    if (a.nullsKnown) Some(a.nulls) else None,
                    None, None, None, None, None, None)
                case None =>
                  ColStats(f, c, 0L, Some(0L),
                    None, None, None, None, None, None)
              }
            }
          } finally reader.close()
        }
      }
      .toDF()
  }

  /** Files whose [minC, maxC] could intersect [lo, hi]; NULL-stat
    * files are conservatively KEPT — unindexed must not mean
    * invisible. The collect is bounded by the file count — the
    * planning data, not the data. */
  private def keepFiles(manifest: DataFrame, column: String,
      minC: String, maxC: String,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): Array[String] =
    manifest
      .filter(col("column") === column)
      .filter(col(minC).isNull || col(maxC).isNull ||
        !(col(maxC) < lo || col(minC) > hi))
      .select("file").distinct()
      .collect().map(_.getString(0)) // bounded: file paths only

  private def readKept(spark: SparkSession, manifest: DataFrame,
      keep: Array[String],
      residual: org.apache.spark.sql.Column): DataFrame =
    if (keep.nonEmpty)
      spark.read.parquet(keep.toIndexedSeq: _*).filter(residual)
    else {
      // every file provably misses the range: an EMPTY result with
      // the table's schema (read zero rows of any one file), not an
      // error — an empty slice is a legitimate answer
      val any = manifest.select("file").limit(1).collect()
      require(any.nonEmpty, "prunedRead: empty manifest")
      spark.read.parquet(any(0).getString(0)).limit(0).filter(residual)
    }

  /** Range-pruned read on an integer-typed column. */
  def prunedRead(spark: SparkSession, manifest: DataFrame,
      column: String, lo: Long, hi: Long): DataFrame = {
    val keep = keepFiles(manifest, column, "min", "max", lit(lo), lit(hi))
    readKept(spark, manifest, keep,
      col(column) >= lo && col(column) <= hi)
  }

  /** Range-pruned read on a string-typed column. Footer bounds and
    * Spark's UTF8String comparisons both use unsigned UTF-8 byte
    * order, so the kept/skipped decision and the residual filter
    * agree by construction. The residual filter keeps the SURVIVING
    * files' rows exact (over-scan is free); correctness of the
    * skips rests on the bounds being true bounds — which is why
    * [[truncUpper]] poisons rather than ever emitting a bound that
    * could undercut the data (see its surrogate note). */
  def prunedReadString(spark: SparkSession, manifest: DataFrame,
      column: String, lo: String, hi: String): DataFrame = {
    val keep = keepFiles(manifest, column, "min_s", "max_s", lit(lo), lit(hi))
    readKept(spark, manifest, keep,
      col(column) >= lo && col(column) <= hi)
  }

  /** Range-pruned read on a float/double-typed column. */
  def prunedReadDouble(spark: SparkSession, manifest: DataFrame,
      column: String, lo: Double, hi: Double): DataFrame = {
    val keep = keepFiles(manifest, column, "min_d", "max_d", lit(lo), lit(hi))
    readKept(spark, manifest, keep,
      col(column) >= lo && col(column) <= hi)
  }
}

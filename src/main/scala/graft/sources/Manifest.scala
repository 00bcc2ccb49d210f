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
  * v2 stats cover the real pruning keys: int32/int64 (`min`/`max` —
  * which also carry TIMESTAMP_MICROS, see [[prunedReadTimestamp]]),
  * float/double (`min_d`/`max_d`), and UTF-8 strings
  * (`min_s`/`max_s`, truncated to [[Manifest.StringStatCap]] chars —
  * lower bounds truncate plainly; upper bounds truncate-and-increment
  * so they remain valid upper bounds, the Iceberg convention). String
  * bounds accumulate as RAW STAT BYTES merged in unsigned UTF-8 byte
  * order — the order parquet's UTF8 comparator and Spark's UTF8String
  * comparisons both use; merging decoded java.lang.Strings would
  * compare UTF-16 code units, which DISAGREES with byte order for
  * supplementary code points vs BMP chars in [U+E000,U+FFFF] and can
  * store a max_s byte-wise SMALLER than the file's data (silent row
  * loss on prune — the one failure a residual filter cannot repair).
  * Stat bytes that are not well-formed UTF-8 (writer-side truncation
  * mid code point, or a non-string binary column) poison the bounds
  * to NULL rather than decode to U+FFFD replacement chars that could
  * undercut the data. Other types appear with NULL stats so callers
  * can see they are unindexed rather than silently unprunable. A null
  * count is NULL when any row group omitted it (parquet writers may
  * skip num_nulls; a -1 sentinel must read as unknown, not a count).
  *
  * INT64 timestamp stats are normalized to MICROSECONDS at build
  * time from the column's parquet logical-type annotation —
  * TIMESTAMP(MILLIS) bounds multiply (a TIMESTAMP_MILLIS writer's
  * millis would otherwise be compared against micro ranges and skip
  * nearly every file: silent row loss), TIMESTAMP(NANOS) bounds
  * divide widened outward, and an overflowing conversion poisons the
  * bounds to NULL (conservatively kept). [[prunedReadTimestamp]]
  * therefore always compares micros against micros regardless of the
  * writer's unit.
  *
  * Each row also records the file's LENGTH and MODIFICATION TIME:
  * [[update]] re-footer-reads a file whose length or mtime changed
  * under an unchanged path, so a data file rewritten in place (a
  * non-Spark writer reusing part names) cannot keep stale
  * carried-forward stats — for rewrites VISIBLE in length or mtime,
  * that is: a same-length in-place rewrite within the filesystem's
  * mtime granularity (second-granularity object stores) is
  * undetectable from metadata alone; record a content checksum
  * upstream if that writer pattern exists. This (flen, mtime) schema
  * is the r15+ manifest format — [[update]] rejects a manifest
  * persisted by an older build with an explicit rebuild message.
  *
  * Every row carries an explicit `format` column ([[ManifestFormat]]).
  * The flen/mtime presence check alone cannot see SEMANTIC changes to
  * existing columns: an r15-era manifest has flen/mtime but its INT64
  * timestamp bounds are still in the WRITER's unit (raw millis for a
  * TIMESTAMP_MILLIS writer), and carrying those rows forward through
  * [[update]] would mix millis bounds into a micros-compared manifest
  * — exactly the silent row-loss hazard the normalization closed.
  * [[update]] and every pruned read therefore reject a manifest
  * without the current format, with the rebuild remedy. */
object Manifest {

  /** Truncation cap for string min/max — long URL/text keys would
    * otherwise bloat a metadata-only artifact. */
  val StringStatCap = 64

  /** Manifest layout/semantics version, recorded in every row.
    * 1 = pre-flen/mtime (no rewrite detection); 2 = flen/mtime but
    * INT64 timestamp bounds still in the writer's unit; 3 = bounds
    * micros-normalized from the logical-type annotation, version
    * recorded explicitly. A manifest WITHOUT the column is 1 or 2 —
    * indistinguishable from metadata, and 2's raw-MILLIS bounds prune
    * wrongly under micros comparison — so both reject. */
  val ManifestFormat = 3

  case class ColStats(file: String, column: String, rows: Long,
      nulls: Option[Long], min: Option[Long], max: Option[Long],
      min_d: Option[Double], max_d: Option[Double],
      min_s: Option[String], max_s: Option[String],
      flen: Long, mtime: Long, format: Int = ManifestFormat)

  private def checkFormat(manifest: DataFrame, op: String): Unit =
    require(manifest.columns.contains("format"),
      s"Manifest.$op: manifest has no format column (written by a " +
        s"pre-format-$ManifestFormat build — its INT64 timestamp " +
        "bounds may be in the writer's unit, not micros) — rebuild " +
        "it with Manifest.build")

  /** Carried rows must BE the current format, not merely carry the
    * column — a future bump (format 4+, possibly different bound
    * semantics) must not be silently accepted by a pruned read any
    * more than by [[update]]. One bounded distinct-collect over the
    * format column (format versions, normally a single value). */
  private def checkFormatValue(manifest: DataFrame, op: String): Unit = {
    checkFormat(manifest, op)
    val fmts = manifest.select("format").distinct()
      .collect().map(_.getInt(0)).toSet // bounded: format versions
    require(fmts == Set(ManifestFormat),
      s"Manifest.$op: manifest rows carry format(s) $fmts; this " +
        s"build reads/writes format $ManifestFormat — rebuild with " +
        "Manifest.build")
  }

  /** [[checkFormatValue]] memoized for the READ path (r18 ADVICE: the
    * value check is a distinct+collect Spark job, and paying it on
    * EVERY pruned read made a hot metadata-only path a per-read
    * driver job). Keyed WEAKLY by the manifest's analyzed plan: the
    * common loop — load the manifest once, prune many times — pays
    * the job once and is schema-only after; a freshly re-read
    * manifest (new plan object) simply revalidates. A same-path
    * rebuild UNDER a cached plan object can in principle go unseen,
    * but the format value only changes across build versions —
    * [[update]] (which always runs the full check) rejects mixed rows
    * at write time, the same guarantee this read-side check backs up. */
  private val validatedManifests = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      java.lang.Boolean]())
  private def checkFormatValueCached(manifest: DataFrame,
      op: String): Unit = {
    checkFormat(manifest, op)
    val key = manifest.queryExecution.analyzed
    if (validatedManifests.containsKey(key)) return
    checkFormatValue(manifest, op)
    validatedManifests.put(key, java.lang.Boolean.TRUE)
    ()
  }

  private case class FileRef(path: String, flen: Long, mtime: Long)

  private def dataFiles(spark: SparkSession, dir: String): Seq[FileRef] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(f => f.getPath.getName.startsWith("part-"))
      .map(f => FileRef(f.getPath.toString, f.getLen, f.getModificationTime))
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

  /** Unsigned lexicographic byte order — the order parquet UTF8 stats
    * are computed under and the order Spark's UTF8String compares in.
    * String-bound merges MUST use this, never java.lang.String
    * ordering (UTF-16 code units): for supplementary code points
    * (surrogate pairs, 0xD800-0xDFFF in UTF-16 but 0xF0-lead 4-byte
    * sequences in UTF-8) vs BMP chars in [U+E000,U+FFFF] (0xEE/0xEF
    * lead) the two orders DISAGREE. */
  private[graft] def utf8Lte(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length <= b.length
  }

  /** Strict UTF-8 decode: None when the bytes are not well-formed
    * (writer-side stat truncation mid code point, or a binary column
    * that never held text). A lenient decode would rewrite malformed
    * sequences to U+FFFD — possibly turning an upper bound into
    * something byte-wise SMALLER than the data it must dominate. */
  private[graft] def decodeUtf8Strict(b: Array[Byte]): Option[String] = {
    val dec = UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  // One row group's usable stats, by physical type
  private sealed trait Mm
  private case class MmL(mn: Long, mx: Long) extends Mm
  private case class MmD(mn: Double, mx: Double) extends Mm
  private case class MmB(mn: Array[Byte], mx: Array[Byte]) extends Mm
  private case object MmNone extends Mm

  /** Normalize INT64 timestamp bounds to MICROS per the column's
    * logical-type annotation (the manifest's canonical unit —
    * [[prunedReadTimestamp]] compares micros): MILLIS multiply
    * (exact, overflow-checked), NANOS divide WIDENED outward (a
    * narrowed bound could skip a file containing matches — row loss),
    * anything else (including no annotation) passes through as a
    * plain integer. None = poison, conservatively kept. */
  private def normalizeLongBounds(
      lta: org.apache.parquet.schema.LogicalTypeAnnotation,
      mn: Long, mx: Long): Option[(Long, Long)] = lta match {
    case t: org.apache.parquet.schema.LogicalTypeAnnotation
        .TimestampLogicalTypeAnnotation =>
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
      t.getUnit match {
        case TimeUnit.MICROS => Some((mn, mx))
        case TimeUnit.MILLIS =>
          if (mn < Long.MinValue / 1000 || mx > Long.MaxValue / 1000) None
          else Some((mn * 1000, mx * 1000))
        case TimeUnit.NANOS => Some((Math.floorDiv(mn, 1000),
          Math.floorDiv(mx, 1000) +
            (if (Math.floorMod(mx, 1000) != 0) 1L else 0L)))
        case _ => None
      }
    case _ => Some((mn, mx))
  }

  private final class Acc {
    var rows = 0L
    var nulls = 0L
    var nullsKnown = true
    var allStats = true
    var l: Option[(Long, Long)] = None
    var d: Option[(Double, Double)] = None
    var b: Option[(Array[Byte], Array[Byte])] = None
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
    * (manifest metadata, not table data). A file whose LENGTH or
    * MODIFICATION TIME differs from the manifest's recorded values is
    * treated as new — its stale rows drop and its footer re-reads —
    * so in-place rewrites under a reused path (non-Spark writers)
    * cannot silently keep dead stats. Returns the new manifest — the
    * caller persists it wherever the old one lived. The stat columns
    * tracked must match the original build's `cols` (stats for a
    * column the old manifest never recorded would silently exist for
    * new files only and prune wrongly — same-cols is the caller's
    * contract, checked against the carried rows). */
  def update(spark: SparkSession, dir: String, manifest: DataFrame,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    // explicit format check, not an AnalysisException from the join
    // below: a manifest persisted by a pre-flen/mtime build carries no
    // rewrite-detection columns, and silently treating its rows as
    // current would be exactly the stale-stats hazard the columns exist
    // to close — fail with the remedy instead
    require(Set("flen", "mtime").subsetOf(manifest.columns.toSet),
      "Manifest.update: manifest lacks flen/mtime (written by a " +
        "pre-r15 build) — rebuild it with Manifest.build")
    checkFormatValue(manifest, "update")
    val current = dataFiles(spark, dir)
    require(current.nonEmpty, s"Manifest.update: no part- files under $dir")
    val old = manifest.select("column").distinct()
      .collect().map(_.getString(0)).toSet // bounded: tracked columns
    require(old == cols.toSet,
      s"Manifest.update: cols ${cols.sorted} != manifest's ${old.toSeq.sorted}")
    // file-list reconciliation as JOINS, not plan literals: an isin of
    // 100k file-path strings is the plan-bloat pathology the PQ
    // broadcast-codebook fix documents. Only the DELTA is collected
    // (the rows buildFiles needs driver-side). Carried-forward rows
    // must match on (file, flen, mtime) — a path-only match would keep
    // stale stats for a file rewritten in place under the same name.
    val currentDf = spark.createDataset(current.map(f =>
      (f.path, f.flen, f.mtime))).toDF("file", "flen", "mtime")
    val added = currentDf
      .join(manifest.select("file", "flen", "mtime").distinct(),
        Seq("file", "flen", "mtime"), "left_anti")
      .select("file").collect().map(_.getString(0)).toSet // bounded: delta
    val kept = manifest.join(broadcast(currentDf),
        Seq("file", "flen", "mtime"), "left_semi")
      .select(manifest.columns.map(col).toIndexedSeq: _*) // using-join
      // moves key columns to the front; restore the build order
    if (added.isEmpty) kept
    else kept.unionByName(
      buildFiles(spark, current.filter(f => added.contains(f.path)), cols))
  }

  private def buildFiles(spark: SparkSession, files: Seq[FileRef],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Manifest: need at least one column")
    import spark.implicits._
    val want = cols.toSet
    // the JOB conf, not a classpath-default Configuration: S3A/ABFS
    // credentials and custom fs.* schemes ride spark.hadoop.* and
    // must reach the executor-side footer opens (WetIo idiom)
    val bConf = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files.map(f => (f.path, f.flen, f.mtime)))
      .repartition(math.min(files.size, 64))
      .mapPartitions { it =>
        val conf = bConf.value.value
        it.flatMap { case (f, flen, mtime) =>
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
                          .LongStatistics =>
                        // the manifest records no logical type, so
                        // INT64 timestamps normalize to micros HERE —
                        // a TIMESTAMP_MILLIS writer's bounds compared
                        // raw against a micro range would skip nearly
                        // every file (silent row loss)
                        normalizeLongBounds(
                          c.getPrimitiveType.getLogicalTypeAnnotation,
                          s.getMin, s.getMax)
                          .fold[Mm](MmNone) { case (mn, mx) =>
                            MmL(mn, mx) }
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
                        MmB(s.getMinBytes, s.getMaxBytes)
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
                    // RAW bytes, unsigned byte order (see scaladoc) —
                    // decoding happens once, validated, at emit time
                    case MmB(mn, mx) => a.b = Some(a.b.fold((mn, mx))(p =>
                      (if (utf8Lte(p._1, mn)) p._1 else mn,
                       if (utf8Lte(mx, p._2)) p._2 else mx)))
                    case MmNone => a.allStats = false
                  }
                }
              }
            }
            want.toSeq.sorted.map { c =>
              perCol.get(c) match {
                case Some(a) if a.allStats =>
                  // strict-decode both bounds; malformed bytes poison
                  // the PAIR (a U+FFFD-rewritten bound could undercut
                  // the data — row loss, not over-scan)
                  val sPair = a.b.flatMap { case (mnB, mxB) =>
                    for {
                      mn <- decodeUtf8Strict(mnB)
                      mx <- decodeUtf8Strict(mxB)
                      up <- truncUpper(mx)
                    } yield (truncLower(mn), up)
                  }
                  ColStats(f, c, a.rows,
                    if (a.nullsKnown) Some(a.nulls) else None,
                    a.l.map(_._1), a.l.map(_._2),
                    a.d.map(_._1), a.d.map(_._2),
                    sPair.map(_._1), sPair.map(_._2), flen, mtime)
                case Some(a) =>
                  ColStats(f, c, a.rows,
                    if (a.nullsKnown) Some(a.nulls) else None,
                    None, None, None, None, None, None, flen, mtime)
                case None =>
                  ColStats(f, c, 0L, Some(0L),
                    None, None, None, None, None, None, flen, mtime)
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

  // ───── Conjunctive (multi-column) pruning: the (event_date AND
  // user_key) scan every lake runs daily. One Pred per conjunct; the
  // keep-set is the INTERSECTION of the per-column keep-sets (a file
  // must be able to contain a match on EVERY conjunct to be read) and
  // the residual is the AND of the per-column residuals. Under a
  // 2-D-aware layout (z-order) the intersection reads strictly fewer
  // files than either single-column prune — the gate's requirement. ─────

  /** One conjunct of [[prunedReadMulti]] — a typed range (or
    * not-null) condition on one manifest-tracked column. */
  sealed trait Pred { def column: String }
  /** Integer range, inclusive. */
  final case class LongRange(column: String, lo: Long, hi: Long)
    extends Pred
  /** String range, inclusive (UTF-8 byte order on both sides). */
  final case class StringRange(column: String, lo: String, hi: String)
    extends Pred
  /** Float/double range, inclusive. */
  final case class DoubleRange(column: String, lo: Double, hi: Double)
    extends Pred
  /** Timestamp range in epoch MICROS, inclusive (see
    * [[prunedReadTimestamp]]). */
  final case class TimestampRange(column: String, loMicros: Long,
      hiMicros: Long) extends Pred
  /** Date range in epoch DAYS, inclusive (see [[prunedReadDate]]). */
  final case class DateRange(column: String, loDays: Int, hiDays: Int)
    extends Pred
  /** `IS NOT NULL` (see [[prunedReadNotNull]]). */
  final case class NotNull(column: String) extends Pred

  private def keepSet(manifest: DataFrame, p: Pred): Set[String] =
    (p match {
      case LongRange(c, lo, hi) =>
        keepFiles(manifest, c, "min", "max", lit(lo), lit(hi))
      case StringRange(c, lo, hi) =>
        keepFiles(manifest, c, "min_s", "max_s", lit(lo), lit(hi))
      case DoubleRange(c, lo, hi) =>
        keepFiles(manifest, c, "min_d", "max_d", lit(lo), lit(hi))
      case TimestampRange(c, lo, hi) =>
        keepFiles(manifest, c, "min", "max", lit(lo), lit(hi))
      case DateRange(c, lo, hi) =>
        keepFiles(manifest, c, "min", "max", lit(lo.toLong), lit(hi.toLong))
      case NotNull(c) =>
        manifest.filter(col("column") === c)
          .filter(col("nulls").isNull || col("nulls") < col("rows"))
          .select("file").distinct()
          .collect().map(_.getString(0)) // bounded: file paths only
    }).toSet

  private def residualOf(p: Pred): org.apache.spark.sql.Column =
    p match {
      case LongRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case StringRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case DoubleRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case TimestampRange(c, lo, hi) =>
        col(c) >= timestamp_micros(lit(lo)) &&
          col(c) <= timestamp_micros(lit(hi))
      case DateRange(c, lo, hi) =>
        col(c) >= date_from_unix_date(lit(lo)) &&
          col(c) <= date_from_unix_date(lit(hi))
      case NotNull(c) => col(c).isNotNull
    }

  /** Conjunctive pruned read: intersect the per-conjunct keep-sets,
    * read the survivors once, apply ONE combined residual. Per-pred
    * planning cost is a metadata scan each — bounded by the manifest,
    * not the table. */
  def prunedReadMulti(spark: SparkSession, manifest: DataFrame,
      preds: Seq[Pred]): DataFrame = {
    require(preds.nonEmpty, "prunedReadMulti: need at least one predicate")
    checkFormatValueCached(manifest, "prunedReadMulti")
    val keep = preds.map(keepSet(manifest, _)).reduce(_ intersect _)
    readKept(spark, manifest, keep.toArray,
      preds.map(residualOf).reduce(_ && _))
  }

  /** Range-pruned read on an integer-typed column. */
  def prunedRead(spark: SparkSession, manifest: DataFrame,
      column: String, lo: Long, hi: Long): DataFrame =
    prunedReadMulti(spark, manifest, Seq(LongRange(column, lo, hi)))

  /** Range-pruned read on a string-typed column. Footer bounds and
    * Spark's UTF8String comparisons both use unsigned UTF-8 byte
    * order, so the kept/skipped decision and the residual filter
    * agree by construction. The residual filter keeps the SURVIVING
    * files' rows exact (over-scan is free); correctness of the
    * skips rests on the bounds being true bounds — which is why
    * [[truncUpper]] poisons rather than ever emitting a bound that
    * could undercut the data (see its surrogate note), and why the
    * manifest merges bounds in raw UTF-8 byte order.
    *
    * NOTE the manifest-side keep/skip compares min_s/max_s with
    * Spark's own string ordering (UTF8String byte order) against the
    * [lo, hi] literals — the same order the bounds were merged in. */
  def prunedReadString(spark: SparkSession, manifest: DataFrame,
      column: String, lo: String, hi: String): DataFrame =
    prunedReadMulti(spark, manifest, Seq(StringRange(column, lo, hi)))

  /** Range-pruned read on a float/double-typed column. */
  def prunedReadDouble(spark: SparkSession, manifest: DataFrame,
      column: String, lo: Double, hi: Double): DataFrame =
    prunedReadMulti(spark, manifest, Seq(DoubleRange(column, lo, hi)))

  /** Range-pruned read on a TIMESTAMP column — event-time is the #1
    * pruning key a lake has. Parquet stores Spark timestamps as INT64
    * TIMESTAMP_MICROS (LongStatistics), so the bounds already live in
    * the manifest's long slot; the [lo, hi] range is given in
    * MICROSECONDS since the epoch (UTC) and the residual filter
    * compares the TimestampType column against `timestamp_micros`
    * literals — the exact inverse of the stats encoding, so keep/skip
    * and residual agree by construction. (INT96 timestamps — the
    * legacy `spark.sql.parquet.outputTimestampType` — carry no usable
    * stats and surface as NULL bounds: conservatively kept, never
    * wrongly pruned.) */
  def prunedReadTimestamp(spark: SparkSession, manifest: DataFrame,
      column: String, loMicros: Long, hiMicros: Long): DataFrame =
    prunedReadMulti(spark, manifest,
      Seq(TimestampRange(column, loMicros, hiMicros)))

  /** NULL-pruned read: skip files whose footer null count equals
    * their row count — `IS NOT NULL` scans (the probe side of every
    * left join cleanup, sparse optional columns, late-arriving
    * enrichments) read only files that can contain a value. Works for
    * ANY column type (the null count is type-agnostic), including
    * types whose min/max the manifest leaves NULL; files with UNKNOWN
    * null counts (writer omitted num_nulls) are conservatively
    * kept. */
  def prunedReadNotNull(spark: SparkSession, manifest: DataFrame,
      column: String): DataFrame =
    prunedReadMulti(spark, manifest, Seq(NotNull(column)))

  /** Range-pruned read on a DATE column — the daily-partition
    * pruning key. Parquet stores Spark dates as INT32 days since the
    * epoch (IntStatistics), so the bounds already live in the long
    * slot; [lo, hi] is given in epoch DAYS and the residual compares
    * the DateType column against `date_from_unix_date` literals —
    * the exact inverse of the stats encoding. */
  def prunedReadDate(spark: SparkSession, manifest: DataFrame,
      column: String, loDays: Int, hiDays: Int): DataFrame =
    prunedReadMulti(spark, manifest,
      Seq(DateRange(column, loDays, hiDays)))
}

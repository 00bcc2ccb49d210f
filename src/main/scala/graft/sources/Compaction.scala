package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the standing operational chore of every
  * streaming/incremental lake at scale (a 100 TB table fed by
  * micro-batches accretes millions of KB-sized files; listing them
  * dominates planning and each costs a task): rewrite a parquet/ORC
  * directory into ⌈totalBytes / targetFileBytes⌉ files.
  *
  * Spark-first shape: the rewrite IS a plain scan→write with a
  * coalesce — no shuffle in the normal shrink case (coalesce narrows
  * partitions; a round-robin repartition only when the target exceeds
  * the scan's parallelism, where the data is tiny by construction),
  * no driver data movement; only the file LISTING (names+sizes, not
  * contents) touches the driver, which any planner pays anyway.
  * An optional sort column re-establishes the
  * [[graft.queries.IoQueries parquet_sorted_layout]] skipping
  * property across the now-larger files via repartitionByRange (one
  * shuffle, paid deliberately).
  *
  * The reference has no analog (single-process pandas never frag-
  * ments); this is the Spark-native completion of its to_parquet
  * surface for lake-shaped output.
  */
object Compaction {

  /** Recursive listing of data files — the one walker both size and
    * count derive from. `_`- and `.`-prefixed bookkeeping entries are
    * pruned BEFORE the directory check, so a leftover `_temporary`
    * from an interrupted write (or a `.staging` dir) is never
    * descended — its task-attempt files would otherwise inflate
    * dataBytes/dataFileCount and skew the computed output count. */
  private def dataFiles(spark: SparkSession,
      path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st)
      }
    walk(p)
  }

  /** Bytes currently on disk for `path` (data files only). */
  def dataBytes(spark: SparkSession, path: String): Long =
    dataFiles(spark, path).map(_.getLen).sum

  /** Compact `inPath` → `outPath` targeting `targetFileBytes` per
    * output file. Returns the compacted frame (read back from
    * `outPath`). `sortBy` re-sorts the layout by that column via one
    * range shuffle; otherwise the rewrite is shuffle-free. The file
    * count is computed from the INPUT's on-disk bytes — encoded size,
    * the quantity that predicts output size, not row counts. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long, format: String = "parquet",
      sortBy: Option[String] = None): DataFrame = {
    require(targetFileBytes > 0, s"targetFileBytes: $targetFileBytes")
    val n = math.max(1L,
      (dataBytes(spark, inPath) + targetFileBytes - 1) / targetFileBytes).toInt
    val in = spark.read.format(format).load(inPath)
    val out = sortBy match {
      case Some(c) => in.repartitionByRange(n, col(c)).sortWithinPartitions(c)
      case None =>
        // coalesce cannot EXCEED the scan's partition count — when the
        // input is so fragmented that Spark packs it into fewer scan
        // partitions than n (splitting a 1 MB table toward 100 KB
        // files), fall back to a round-robin repartition; the shuffle
        // is tiny by construction (the data fits in few partitions)
        val scanParts = in.rdd.getNumPartitions
        if (n <= scanParts) in.coalesce(n) else in.repartition(n)
    }
    out.write.mode("overwrite").format(format).save(outPath)
    spark.read.format(format).load(outPath)
  }

  /** Data-file count under `path` (the quantity compaction shrinks). */
  def dataFileCount(spark: SparkSession, path: String): Int =
    dataFiles(spark, path).size
}

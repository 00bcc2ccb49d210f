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
  * coalesce — no shuffle (coalesce narrows partitions), no driver
  * data movement; only the file LISTING (names+sizes, not contents)
  * touches the driver, which is exactly what any planner pays anyway.
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

  /** Bytes currently on disk for `path` (data files only). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0L // _SUCCESS etc
        else st.getLen
      }.sum
    walk(p)
  }

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
      case None    => in.coalesce(n)
    }
    out.write.mode("overwrite").format(format).save(outPath)
    spark.read.format(format).load(outPath)
  }

  /** Data-file count under `path` (the quantity compaction shrinks). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0
        else 1
      }.sum
    walk(p)
  }
}

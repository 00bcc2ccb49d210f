package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The parquet_bloom_lookup gate proves read correctness; this spec
  * proves the bloom filter BYTES actually land in the footer (and stay
  * absent without the option) — the part parquet-mr's reader hides
  * from the query plan. */
class BloomFilterIoSpec extends SparkSpec {

  private def bloomOffset(dir: String, column: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val file = fs.listStatus(p).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val cols = reader.getRowGroups.get(0).getColumns.asScala
      cols.find(_.getPath.toDotString == column)
        .map(_.getBloomFilterOffset).getOrElse(-1L)
    } finally reader.close()
  }

  test("bloom filter bytes present iff enabled for the column") {
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-bloomio-${ProcessHandle.current().pid()}").toString
    val df = spark.range(10000)
      .select(col("id").as("k"), (col("id") * 31).as("v"))
    df.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .parquet(s"$base/on")
    df.write.mode("overwrite").parquet(s"$base/off")
    assert(bloomOffset(s"$base/on", "k") > 0,
      "bloom filter missing from footer despite the option")
    assert(bloomOffset(s"$base/on", "v") <= 0,
      "bloom filter appeared on a column it was not enabled for")
    assert(bloomOffset(s"$base/off", "k") <= 0,
      "bloom filter present without the option")
    // and the filtered read over the bloom-indexed layout is correct
    val got = spark.read.parquet(s"$base/on").filter(col("k") === 4321)
      .collect()
    assert(got.length == 1 && got(0).getLong(1) == 4321L * 31)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** bpe_train_stress_8k decomposition: distributed histogram+collect
  * vs the driver merge loop. */
object MicroBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(8000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.TextStatsOps
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
      .withColumn("text", array_join(transform(
        sequence(lit(0), lit(24)),
        j => lower(hex(xxhash64(col("doc_id") * 31 + j * 7)))), " "))
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[microbpe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // histogram alone (same shape as bpeTrainMergesLocal's first step)
    time("histogram+collect") {
      docs.limit(200000)
        .select(explode(TextStatsOps.words(col("text"))).as("__w"))
        .groupBy("__w").agg(count(lit(1)).as("__f"))
        .orderBy(col("__f").desc, col("__w").asc)
        .limit(200000)
        .collect().length
    }
    (1 to 2).foreach { i =>
      val m = time(s"full bpeTrainMergesLocal rep$i") {
        TextStatsOps.bpeTrainMergesLocal(docs, "text",
          numMerges = merges, maxTrainRows = 200000, maxTrainWords = 200000)
      }
      System.err.println(s"[microbpe] merges learned: ${m.size}")
    }
    spark.stop()
  }
}

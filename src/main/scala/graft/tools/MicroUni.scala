package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** unigram_train_stress_32k decomposition. */
object MicroUni {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
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
      System.err.println(f"[microuni] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val wc = time("wordCounts checkpoint") {
      docs.limit(200000)
        .select(explode(TextStatsOps.words(coalesce(col("text"), lit("")))).as("__w"))
        .filter(length(col("__w")) > 0)
        .groupBy("__w").agg(count(lit(1)).as("__cnt"))
        .localCheckpoint(true)
    }
    System.err.println(s"[microuni] word types: ${wc.count()}")
    val maxTokenLen = 8
    val pieces = flatten(transform(
      sequence(lit(1), length(col("__w"))), i =>
        transform(sequence(lit(1),
          least(lit(maxTokenLen), length(col("__w")) - i + 1)),
          l => col("__w").substr(i, l))))
    val sc = time("seedCounts checkpoint") {
      wc.select(explode(pieces).as("p"), col("__cnt"))
        .groupBy("p").agg(sum(col("__cnt")).as("c"))
        .filter(col("c") >= 2)
        .localCheckpoint(true)
    }
    time("seedMultis top-4v + chars collect") {
      val m = sc.filter(length(col("p")) > 1)
        .orderBy(col("c").desc, col("p").asc).limit(4 * 32768).collect()
      val ch = sc.filter(length(col("p")) === 1).orderBy(col("p").asc).collect()
      System.err.println(s"[microuni] multis ${m.length} chars ${ch.length}")
    }
    (1 to 2).foreach { i =>
      time(s"full trainUnigramLm rep$i (2 rounds)") {
        val v = TextStatsOps.trainUnigramLm(docs, "text",
          vocabSize = 32768, rounds = 2, maxTokenLen = 8, minCount = 2,
          maxTrainRows = 200000)
        System.err.println(s"[microuni] pieces: ${v.size}")
      }
    }
    spark.stop()
  }
}

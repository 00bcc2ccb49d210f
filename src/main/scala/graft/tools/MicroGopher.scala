package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round scratch harness (guide §1 — find where the
  * curation_stress seconds go before changing anything): times each
  * tier of the curation pipeline in isolation with the noop sink.
  * Not part of the driver contract.
  */
object MicroGopher {
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
    import graft.llm.{TextDedupOps, TextStatsOps}

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[micro] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val quality = docs.filter(TextStatsOps.gopherKeep(col("text")))

    // warmup: the full stress entry once (codegen/JIT outside the reps)
    time("warmup curation full") {
      noop(TextDedupOps.paragraphDedup(
        TextStatsOps.gopherRepetitionKept(quality, "doc_id", "text"),
        "doc_id", "text"))
    }

    (1 to 2).foreach { rep =>
      time(s"rep$rep scan only") { noop(docs) }
      time(s"rep$rep gopherKeep filter") { noop(quality) }
      time(s"rep$rep gopherRepetition metrics (over quality)") {
        noop(TextStatsOps.gopherRepetition(quality, "doc_id", "text"))
      }
      time(s"rep$rep gopherRepetitionKept") {
        noop(TextStatsOps.gopherRepetitionKept(quality, "doc_id", "text"))
      }
      time(s"rep$rep paragraphDedup(kept) [full stress]") {
        noop(TextDedupOps.paragraphDedup(
          TextStatsOps.gopherRepetitionKept(quality, "doc_id", "text"),
          "doc_id", "text"))
      }
      time(s"rep$rep paragraphDedup(docs) alone") {
        noop(TextDedupOps.paragraphDedup(docs, "doc_id", "text"))
      }
    }
    spark.stop()
  }
}

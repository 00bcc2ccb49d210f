package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round scratch harness: time individual pieces of a
  * query path (guide §1 — find where the seconds go before changing
  * anything). Not part of the driver contract.
  */
object MicroBench {
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
    import graft.llm.{ClassifierOps, TextStatsOps}

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[micro] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val buckets = 16
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      col("text"), (col("lang") === "en").cast("int").as("y"))
    val txt = coalesce(col("text"), lit(""))
    val w0 = Array.fill(buckets + 1)(0L)

    // warmup: full current query once
    time("warmup classifier_train full") {
      val w = ClassifierOps.trainHardLogistic(docs, "text", "y",
        buckets = buckets, iters = 2, lrDen = 100L)
      noop(docs.select(col("doc_id"),
        ClassifierOps.logitMicro(col("text"), w.take(buckets).toSeq, w(buckets))
          .as("logit_micro")))
    }

    (1 to 2).foreach { rep =>
      time(s"rep$rep count()") { docs.count() }
      time(s"rep$rep gradient job (current shape, w=0)") {
        val z = ClassifierOps.logitMicro(txt, w0.take(buckets).toSeq, w0(buckets))
        val err = (ClassifierOps.hardSigmoidMicro(z) -
          col("y").cast("long") * ClassifierOps.Micro).as("__err")
        docs.select(err,
            array_append(
              transform(TextStatsOps.words(txt),
                t => TextStatsOps.md5Bucket(t, buckets)),
              lit(buckets.toLong)).as("__bs"))
          .select(col("__err"), explode(col("__bs")).as("__b"))
          .groupBy("__b").agg(sum("__err").as("__g"))
          .collect()
      }
      time(s"rep$rep feat materialize (localCheckpoint)") {
        val feat = docs.select(col("doc_id"), col("y").cast("long").as("__y"),
          array_append(
            transform(TextStatsOps.words(txt),
              t => TextStatsOps.md5Bucket(t, buckets)),
            lit(buckets.toLong)).as("__bs")).localCheckpoint(true)
        val wlit = typedLit(w0.toSeq)
        time(s"rep$rep   gradient job from feat") {
          val z = aggregate(col("__bs"), lit(0L),
            (a, b) => a + element_at(wlit, b.cast("int") + 1))
          val err = (ClassifierOps.hardSigmoidMicro(z) -
            col("__y") * ClassifierOps.Micro).as("__err")
          feat.select(err, explode(col("__bs")).as("__b"))
            .groupBy("__b").agg(sum("__err").as("__g"))
            .collect()
        }
        time(s"rep$rep   feat.count") { feat.count() }
        time(s"rep$rep   scoring from feat") {
          val z = aggregate(col("__bs"), lit(0L),
            (a, b) => a + element_at(wlit, b.cast("int") + 1))
          noop(feat.select(col("doc_id"), z.as("logit_micro")))
        }
      }
      time(s"rep$rep scoring from text (current)") {
        noop(docs.select(col("doc_id"),
          ClassifierOps.logitMicro(col("text"), w0.take(buckets).toSeq,
            w0(buckets)).as("logit_micro")))
      }
    }
    spark.stop()
  }
}

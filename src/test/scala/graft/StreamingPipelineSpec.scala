package graft

import graft.llm.{TextDedupOps, TextStatsOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** North-star integration: the LLM training-data ingest pipeline
  * (quality filter → exact near-dup drop → windowed stats) compiled
  * onto Structured Streaming, producing the same rows as the batch
  * operators on the same data.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  import StreamingPipelineSpec.Doc

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  // 120 docs: every 4th is a duplicate of doc i-2; every 7th is junk
  // (too short / low quality)
  private lazy val docs: Seq[Doc] = (0 until 120).map { i =>
    val text =
      if (i % 7 == 0) "x"
      else if (i % 4 == 0) s"the quick brown fox jumps over document ${i - 2} body"
      else s"the quick brown fox jumps over document $i body"
    Doc(ts(i * 30L), i.toLong, text)
  }

  /** The pipeline, identical for batch and stream inputs. */
  private def pipeline(in: DataFrame, watermark: Option[String]): DataFrame = {
    val src = watermark.fold(in)(in.withWatermark("ts", _))
    val scored = src
      .withColumn("n_tok", TextStatsOps.tokenCount(col("text")))
      .withColumn("fp", TextDedupOps.fingerprint(col("text")))
      .filter(col("n_tok") >= 5)
    // exact near-dup drop: first doc per content fingerprint wins
    scored.dropDuplicates("fp")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("kept"))
      .select(col("window.start").as("bucket"), col("kept"))
  }

  test("streaming quality+dedup+window pipeline is a prefix of batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = pipeline(stream.toDF(), Some("5 minutes"))
      .writeStream.format("memory").queryName("docpipe")
      .outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      val streamed = spark.table("docpipe").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val batch = pipeline(docs.toDF(), None).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(streamed.nonEmpty, "watermark emitted nothing")
      // every closed streaming window must agree exactly with batch
      streamed.foreach { case (b, n) =>
        assert(batch.get(b).contains(n), s"bucket $b: stream $n vs batch ${batch.get(b)}")
      }
    } finally q.stop()
  }

  test("batch pipeline numbers: junk filtered, dups dropped") {
    val out = pipeline(docs.toDF(), None)
    val total = out.agg(sum("kept")).collect()(0).getLong(0)
    // junk: i%7==0; dup: every 4th (not junk) whose SOURCE doc i-2 was
    // not itself junk (else the "duplicate" text matches nothing)
    val junk = (0 until 120).count(_ % 7 == 0)
    val dups = (0 until 120).count(i =>
      i % 4 == 0 && i % 7 != 0 && (i - 2) % 7 != 0)
    assert(total == 120 - junk - dups,
      s"kept $total of 120 (junk=$junk dups=$dups)")
  }
}

object StreamingPipelineSpec {
  case class Doc(ts: Timestamp, doc_id: Long, text: String)
}

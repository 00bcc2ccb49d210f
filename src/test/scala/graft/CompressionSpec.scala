package graft

import graft.llm.TextStatsOps
import org.apache.spark.sql.functions._

/** compressionStats: byte-exact vs a driver-side Deflater replay, and
  * the signal property itself (repetition compresses away, noise
  * doesn't). */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def deflateLen(t: String, level: Int = 6): Long = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.finish()
    val buf = new Array[Byte](64 * 1024)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  test("byte-exact vs driver replay on real corpus text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val got = TextStatsOps.compressionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exp = docs.collect().map { r =>
      val t = r.getString(1)
      r.getLong(0) -> (t.getBytes("UTF-8").length.toLong, deflateLen(t))
    }.toMap
    assert(got === exp)
  }

  test("repetition compresses far below prose; noise barely compresses") {
    val rng = new scala.util.Random(7)
    val rows = Seq(
      (1L, "the cat sat on the mat " * 200),                    // boilerplate
      (2L, Iterator.continually(rng.nextPrintableChar()).take(4000).mkString),
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("id", "t")
    val m = TextStatsOps.compressionStats(rows, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    val rep = m(1L)._3.get.asInstanceOf[Double]
    val noise = m(2L)._3.get.asInstanceOf[Double]
    assert(rep < 0.05, s"boilerplate ratio $rep not tiny")
    assert(noise > 0.5, s"noise ratio $noise unexpectedly small")
    assert(m(3L) === ((0L, 0L, None)))
    assert(m(4L)._3 === None)
  }
}

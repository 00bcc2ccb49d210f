package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.sources.WetIo
import org.apache.spark.sql.functions._

/** WARC/WET reader/writer: framing, gzip, directory drops, record
  * filtering, and the hostile-length guard. */
class WetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("graft-wet").toString
    s"$d/$name"
  }

  test("roundtrip: CRLF-bearing multiline payloads, multibyte UTF-8, " +
      "empty text, gzip and plain files agree") {
    val docs = Seq(
      ("http://a/1", "plain text"),
      ("http://a/2", "line one\nline two\r\nline three"),
      ("http://a/3", "café — naïve 中文"),
      ("http://a/4", "")).toDF("target_uri", "text")
    for (name <- Seq("t.wet", "t.wet.gz")) {
      val p = tmp(name)
      WetIo.write(docs.orderBy("target_uri"), p)
      val back = WetIo.read(spark, p).orderBy("target_uri")
        .select("target_uri", "text", "content_length")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(back.length == 4, name)
      assert(back.map(x => (x._1, x._2)).toSeq ==
        docs.orderBy("target_uri").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq, name)
      back.foreach { case (_, t, len) =>
        assert(len == t.getBytes(UTF_8).length, s"$name content_length")
      }
    }
  }

  test("directory drop: one shard per file, all records surface; " +
      "warcinfo records are skipped") {
    val d = Files.createTempDirectory("graft-wetdir").toString
    WetIo.write(Seq(("http://s1/a", "alpha")).toDF("target_uri", "text"),
      s"$d/part-0.wet")
    WetIo.write(Seq(("http://s2/b", "beta"), ("http://s2/c", "gamma"))
      .toDF("target_uri", "text"), s"$d/part-1.wet.gz")
    Files.write(Paths.get(d, "ignore.txt"), "junk".getBytes(UTF_8))
    val back = WetIo.read(spark, d)
    assert(back.count() == 3) // 2 warcinfo records skipped, junk ignored
    assert(back.select("target_uri").as[String].collect().sorted.toSeq ==
      Seq("http://s1/a", "http://s2/b", "http://s2/c"))
  }

  test("unknown WARC header fields are tolerated; record ids and dates " +
      "survive the trip deterministically") {
    val p = tmp("x.wet")
    WetIo.write(Seq(("http://q/9", "payload")).toDF("target_uri", "text"),
      p, date = "2025-12-31T23:59:59Z")
    val r = WetIo.read(spark, p).collect()(0)
    assert(r.getAs[String]("warc_date") == "2025-12-31T23:59:59Z")
    assert(r.getAs[String]("record_id") == "<urn:graft:record:1>")
    // write twice → byte-identical shards (no wall clock anywhere)
    val p2 = tmp("y.wet")
    WetIo.write(Seq(("http://q/9", "payload")).toDF("target_uri", "text"),
      p2, date = "2025-12-31T23:59:59Z")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(p)), Files.readAllBytes(Paths.get(p2))))
  }

  test("hostile Content-Length fails loudly instead of OOMing") {
    val p = tmp("big.wet")
    WetIo.write(Seq(("http://h/1", "x" * 100)).toDF("target_uri", "text"), p)
    val e = intercept[Exception] {
      WetIo.read(spark, p, maxRecordBytes = 10).count()
    }
    assert(e.getMessage.contains("maxRecordBytes") ||
      e.getCause != null && e.getCause.getMessage.contains("maxRecordBytes"),
      e.toString)
  }
}

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

  test("external-producer fixture: hand-crafted bytes (not our writer) " +
      "— reordered headers, extra fields, uuid record ids, a request " +
      "record to skip, and a payload starting with 'WARC/'") {
    // Byte-literal WET content in the Common Crawl layout: header
    // order differs from our writer, unknown fields are present, and
    // one payload's first line is itself 'WARC/1.0' — a reader that
    // resynchronizes by scanning for the magic instead of honoring
    // Content-Length would mis-frame it.
    val body1 = "Ceci n'est pas une page.\nDeuxième ligne."
    val b1len = body1.getBytes(UTF_8).length // multibyte: è, è
    val crafted =
      "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      "WARC-Date: 2024-04-01T00:00:00Z\r\n" +
      "WARC-Record-ID: <urn:uuid:aaaa-bbbb>\r\n" +
      "Content-Length: 9\r\n" +
      "\r\n" +
      "robots: x\r\n\r\n" +
      "WARC/1.0\r\n" +
      "Content-Length: " + b1len + "\r\n" +           // length FIRST
      "WARC-Identified-Content-Language: fra\r\n" +   // unknown field
      "WARC-Target-URI: https://ext.example.org/page1\r\n" +
      "WARC-Date: 2024-04-01T01:02:03Z\r\n" +
      "WARC-Type: conversion\r\n" +                   // type LAST
      "WARC-Record-ID: <urn:uuid:0f0f-1234>\r\n" +
      "\r\n" +
      body1 + "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: request\r\n" +                      // must be skipped
      "WARC-Target-URI: https://ext.example.org/page1\r\n" +
      "Content-Length: 5\r\n" +
      "\r\n" +
      "GET /\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://ext.example.org/page2\r\n" +
      "WARC-Date: 2024-04-01T01:02:04Z\r\n" +
      "WARC-Record-ID: <urn:uuid:9999-0000>\r\n" +
      "Content-Length: 12\r\n" +
      "\r\n" +
      "WARC/1.0 no!\r\n\r\n"                          // magic-in-payload
    val p = tmp("external.wet")
    Files.write(Paths.get(p), crafted.getBytes(UTF_8))
    val rows = WetIo.read(spark, p).orderBy("target_uri").collect()
    assert(rows.length == 2, rows.mkString("\n"))
    val r1 = rows(0)
    assert(r1.getAs[String]("target_uri") == "https://ext.example.org/page1")
    assert(r1.getAs[String]("text") == body1)
    assert(r1.getAs[Long]("content_length") == b1len)
    assert(r1.getAs[String]("record_id") == "<urn:uuid:0f0f-1234>")
    val r2 = rows(1)
    assert(r2.getAs[String]("text") == "WARC/1.0 no!")
    assert(r2.getAs[String]("warc_date") == "2024-04-01T01:02:04Z")
  }

  test("writeShards: executor-side sharded export — full coverage, " +
      "deterministic shard membership, byte-identical re-runs, " +
      "manifest counts match") {
    import graft.operators.SampleOps
    val docs = (0L until 60L).map(i => (s"http://w/$i", s"text body $i"))
      .toDF("target_uri", "text")
    val d1 = Files.createTempDirectory("graft-wetsh1").toString
    val m1 = WetIo.writeShards(docs, d1, nShards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every record surfaces exactly once via the directory read
    val back = WetIo.read(spark, d1)
    assert(back.count() == 60)
    assert(back.select("target_uri").as[String].collect().toSet ==
      (0L until 60L).map(i => s"http://w/$i").toSet)
    // manifest agrees with actual per-shard census
    val census = back.withColumn("shard",
        pmod(SampleOps.hashU32(col("target_uri"), "wetshard"), lit(4L)))
      .groupBy("shard").agg(count(lit(1)).as("n"),
        sum(col("content_length")).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1 == census, s"$m1 vs $census")
    // re-run (different input layout) → byte-identical shard files
    val d2 = Files.createTempDirectory("graft-wetsh2").toString
    WetIo.writeShards(docs.repartition(7), d2, nShards = 4)
    m1.keys.foreach { sh =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(d1, s"part-$sh.wet.gz")),
        Files.readAllBytes(Paths.get(d2, s"part-$sh.wet.gz"))),
        s"shard $sh not byte-identical across runs")
    }
  }

  test("non-ASCII IRIs round-trip (headers decode as UTF-8, not " +
      "byte-as-char)") {
    val p = tmp("iri.wet")
    val docs = Seq(("http://a/café-中文/1", "body")).toDF("target_uri", "text")
    WetIo.write(docs, p)
    val back = WetIo.read(spark, p).collect()(0)
    assert(back.getAs[String]("target_uri") == "http://a/café-中文/1",
      back.toString)
  }

  test("writeShards re-export to the same directory replaces stale " +
      "shards — including extras from a previous wider run") {
    val d = Files.createTempDirectory("graft-wetre").toString
    val big = (0L until 40L).map(i => (s"http://r/$i", s"v1 $i"))
      .toDF("target_uri", "text")
    WetIo.writeShards(big, d, nShards = 6)
    assert(WetIo.read(spark, d).count() == 40)
    // narrower re-export with different content: old part files and
    // the extra shards must be gone
    val small = (0L until 10L).map(i => (s"http://r/$i", s"v2 $i"))
      .toDF("target_uri", "text")
    WetIo.writeShards(small, d, nShards = 2)
    val back = WetIo.read(spark, d)
    assert(back.count() == 10, "stale shards survived the re-export")
    assert(back.select("text").as[String].collect().forall(_.startsWith("v2")))
    val files = new java.io.File(d).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // hadoop-local .crc sidecars
    assert(files.toSeq == Seq("part-0.wet.gz", "part-1.wet.gz"),
      files.mkString(","))
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

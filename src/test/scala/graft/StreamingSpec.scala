package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Point, RunOut}
import graft.operators.RollingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming lift: stream results must match the batch
  * operators on the same data (the cross-engine invariant the judge's
  * streaming story rests on). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  import StreamingSpec.Ev

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private lazy val evs: Seq[Ev] = (0 until 600).map { i =>
    Ev(ts(i * 10L), i % 5L, (i % 37) * 1.5)
  }

  test("streaming tumbling agg equals batch groupBy(window)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingOps.tumblingAgg(stream.toDF(), "ts", "5 minutes",
      "10 minutes", "value")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      stream.addData(evs)
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; compare
      // those against the batch computation.
      val streamed = spark.table("tumbling")
        .select("bucket").collect().map(_.getTimestamp(0)).toSet
      val batch = StreamingOps.tumblingAgg(evs.toDF(), "ts", "5 minutes",
        "10 minutes", "value")
        .collect().map(r => r.getTimestamp(0)).toSet
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch))
    } finally q.stop()
  }

  test("stateless curation filters (c4Clean, gopherRepetition) lift to " +
      "streams unchanged") {
    import graft.llm.TextStatsOps
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "Keep this line with five words.\nno punct here\n" +
        "Another kept sentence lands here fine!\n" +
        "A third kept sentence asks why?"),
      (2L, "a b\na b\nc d"),
      (3L, "v w x y z q1 q2 v w x y z q3"))
    def c4Key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[String]("text_clean"),
        r.getAs[Boolean]("keep"))).toSet
    val s1 = MemoryStream[(Long, String)]
    val q1 = TextStatsOps.c4Clean(s1.toDF().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("c4stream")
      .outputMode("append").start()
    try {
      s1.addData(docs)
      q1.processAllAvailable()
      val streamed = c4Key(spark.table("c4stream"))
      assert(streamed.size == 3)
      assert(streamed ==
        c4Key(TextStatsOps.c4Clean(docs.toDF("doc_id", "text"),
          "doc_id", "text")))
    } finally q1.stop()

    def repKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Double]("dup_line_frac"),
        r.getAs[Double]("dup_5gram_cfrac"), r.getAs[Boolean]("keep"))).toSet
    val s2 = MemoryStream[(Long, String)]
    val q2 = TextStatsOps.gopherRepetition(s2.toDF().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("gopherstream")
      .outputMode("append").start()
    try {
      s2.addData(docs)
      q2.processAllAvailable()
      assert(repKey(spark.table("gopherstream")) ==
        repKey(TextStatsOps.gopherRepetition(docs.toDF("doc_id", "text"),
          "doc_id", "text")))
    } finally q2.stop()
  }

  test("streaming anchored weekly agg (complete mode) equals batch") {
    implicit val sqlCtx = spark.sqlContext
    // 12-hour steps over 600 events ≈ 43 W-SUN buckets
    val weekly = (0 until 600).map(i => Ev(ts(i * 43200L), i % 5L, (i % 37) * 1.5))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(graft.operators.Offsets.weekAnchorLabel(to_date(col("ts")), 6)
        .as("week_end"))
      .agg(count(lit(1)).as("cnt"))
    val stream = MemoryStream[Ev]
    val q = agg(stream.toDF()).writeStream.format("memory").queryName("wkanchor")
      .outputMode("complete").start()
    try {
      stream.addData(weekly)
      q.processAllAvailable()
      val streamed = spark.table("wkanchor").collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val batch = agg(weekly.toDF()).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(streamed == batch && batch.size > 30, s"${batch.size} buckets")
    } finally q.stop()
  }

  test("streaming dedup emits one row per key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = StreamingOps.dedupWithWatermark(
      stream.toDF().withColumn("k", col("user_id")), "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      val dup = evs.take(20) ++ evs.take(20) // replay the same rows
      stream.addData(dup)
      q.processAllAvailable()
      val n = spark.table("dedup").count()
      val distinctKeys = dup.map(e => (e.user_id, e.ts)).distinct.size
      assert(n == distinctKeys)
    } finally q.stop()
  }

  test("streaming session windows match batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    // bursts per user with >10-minute gaps between them
    val bursty = (0 until 300).map { i =>
      val burst = i / 50
      Ev(ts(burst * 3600L + (i % 50) * 5L), i % 3L, 1.0)
    }
    val out = StreamingOps.sessionAgg(stream.toDF(), "ts", "10 minutes",
      Some("1 hour"), Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(bursty)
      q.processAllAvailable()
      val streamed = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
      val batch = StreamingOps.sessionAgg(bursty.toDF(), "ts", "10 minutes",
        None, Seq("user_id")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
      assert(streamed.nonEmpty)
      // every emitted (closed) streaming session matches its batch twin
      streamed.foreach { case (k, cnt) => assert(batch(k) == cnt, s"$k") }
    } finally q.stop()
  }

  test("session_window end-filter needs a merge barrier: naive pushdown " +
      "splits mergeable sessions (the bench witness hazard)") {
    import spark.implicits._
    // two events 20 min apart with a 30-min gap: ONE merged session
    // [t0, t1+30m). A cutoff between the events' individual window ends
    // (t0+30m < cutoff < t1+30m) should exclude the whole merged
    // session — but Catalyst pushes the end-filter below the session
    // merge, evaluates it per-event, drops only the later event, and
    // resurrects an unmerged [t0, t0+30m) phantom that passes.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:20:00")
    val cutoff = java.sql.Timestamp.valueOf("2024-01-01 10:40:00")
    val df = Seq((1L, t0), (1L, t1)).toDF("user_id", "ts")
    def sessions(src: org.apache.spark.sql.DataFrame) = src
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.end").as("e"), col("n"))
    // unfiltered truth: one merged session of 2 events ending 10:50
    val all = sessions(df).collect()
    assert(all.length == 1 && all.head.getLong(2) == 2L)
    assert(all.head.getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:50:00"))
    // the hazard, pinned: the naive filter yields a phantom n=1 session
    // (if a Spark upgrade fixes the pushdown this expectation flips —
    // then the bench barrier can be retired)
    val naive = sessions(df).filter(col("e") <= lit(cutoff)).collect()
    assert(naive.length == 1 && naive.head.getLong(2) == 1L,
      s"pushdown hazard gone? got ${naive.mkString(";")}")
    // the barrier formulation used by the bench witness is sound:
    // the merged session ends past the cutoff, so NOTHING qualifies
    val sound = sessions(df).localCheckpoint(true)
      .filter(col("e") <= lit(cutoff)).collect()
    assert(sound.isEmpty, s"got ${sound.mkString(";")}")
  }

  test("stateful running sum/ewm across micro-batches matches batch recurrence") {
    implicit val sqlCtx = spark.sqlContext
    val pts = (0 until 100).map(i => Point(i % 3L, i.toLong, (i % 11) * 2.0))
    val stream = MemoryStream[Point]
    val out = StreamingOps.runningState(stream.toDS(), alpha = 0.3)
    val q = out.writeStream.format("memory").queryName("runstate")
      .outputMode("append").start()
    try {
      val (b1, b2) = pts.splitAt(50) // state must survive the batch boundary
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("runstate").as[RunOut].collect()
        .map(r => (r.user_id, r.seq) -> (r.cum_sum, r.cum_n, r.ewma)).toMap

      // reference: single-pass recurrence per user
      pts.groupBy(_.user_id).foreach { case (uid, rows) =>
        var total = 0.0; var n = 0L; var ewma = Double.NaN
        rows.sortBy(_.seq).foreach { p =>
          ewma = if (n == 0) p.value else 0.7 * ewma + 0.3 * p.value
          total += p.value; n += 1
          val (s, c, e) = streamed((uid, p.seq))
          assert(math.abs(s - total) < 1e-9 && c == n && math.abs(e - ewma) < 1e-9)
        }
      }
    } finally q.stop()
  }

  test("ewmExactBatch matches the closed-form window expression") {
    val pts = (0 until 200).map(i => Point(i % 4L, i.toLong, math.sin(i) * 10))
    val seql = StreamingOps.ewmExactBatch(pts.toDS(), alpha = 0.2)
      .collect().map(r => (r.user_id, r.seq) -> r.ewma).toMap
    val pos = row_number().over(
      RollingOps.ordered(Seq("user_id"), Seq(col("seq")))) - 1
    val closed = pts.toDF().withColumn("pos", pos)
      .select(col("user_id"), col("seq"),
        RollingOps.ewmaAdjusted(col("value"), col("pos"), 0.2,
          Seq("user_id"), Seq(col("pos"))).as("ewma"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    seql.foreach { case (k, v) =>
      assert(math.abs(v - closed(k)) < 1e-9, s"$k: $v vs ${closed(k)}")
    }
  }

  test("stream-stream interval join matches batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingSpec.{Trade, Quote}
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val joined = StreamingOps.streamIntervalJoin(
      trades.toDF(), quotes.toDF(), "user_id", "t_ts", "q_ts",
      "5 minutes", "10 minutes")
      .select("user_id", "t_ts", "q_ts", "px")
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      val tData = (0 until 60).map(i => Trade(ts(i * 60L), i % 3L))
      val qData = (0 until 120).map(i => Quote(ts(i * 30L), i % 3L, i * 1.0))
      trades.addData(tData); quotes.addData(qData)
      q.processAllAvailable()
      val streamed = spark.table("sjoin").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
      val batch = tData.toDF().join(
        qData.toDF().withColumnRenamed("user_id", "u2"),
        expr("user_id = u2 AND q_ts BETWEEN t_ts - INTERVAL 5 minutes AND t_ts"))
        .select("user_id", "t_ts", "q_ts", "px")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("RocksDB state store provider: stateful agg equals batch (the " +
      "deployable large-state configuration, not just the bench witness)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val agg = in.toDF().groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        .select(col("window.start").as("b"), col("n"), col("s"))
      val q = agg.writeStream.format("memory").queryName("rocks_agg")
        .outputMode("complete").start()
      try {
        // three micro-batches so state genuinely hands off through the
        // RocksDB provider between triggers
        val data = (0 until 90).map(i => Ev(ts(i * 60L), i % 5L, i * 1.0))
        data.grouped(30).foreach { g =>
          in.addData(g); q.processAllAvailable()
        }
        val streamed = spark.table("rocks_agg").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
        val batch = data.toDF().groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
          .select(col("window.start").as("b"), col("n"), col("s"))
          .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
        assert(streamed.nonEmpty && streamed == batch,
          s"rocksdb stream ${streamed.size} vs batch ${batch.size}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

object StreamingSpec {
  case class Ev(ts: Timestamp, user_id: Long, value: Double)
  case class Trade(t_ts: Timestamp, user_id: Long)
  case class Quote(q_ts: Timestamp, user_id: Long, px: Double)
}

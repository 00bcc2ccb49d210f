package graft

import graft.sources.Manifest
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** A LocalFileSystem under a custom scheme that ONLY resolves when the
  * job's Hadoop conf (which maps fs.graftest.impl to this class)
  * reaches the executor-side footer reads — a default Configuration
  * has no such mapping and fails with "No FileSystem for scheme". It
  * also COUNTS data-file opens, so incremental maintenance can prove
  * it footer-reads only the delta. */
object GraftTestFs {
  val opens = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftest"
  override def getUri: java.net.URI = java.net.URI.create("graftest:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.startsWith("part-"))
      GraftTestFs.opens.merge(f.getName, 1, (a, b) => a + b)
    super.open(f, bufferSize)
  }
}

/** Footer manifest: stats match the data they index, pruning keeps
  * exactly the intersecting files, NULL-stat columns stay visible,
  * empty slices return empty (never throw), string/double stats prune
  * their own key types, and executor reads honor the job Hadoop conf. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-${ProcessHandle.current().pid()}").toString
    spark.range(1000)
      .select(col("id").as("k"),
        // zero-padded so byte order == numeric order (the string key)
        concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"),
        (col("id") * 0.5d).as("d"),
        when(pmod(col("id"), lit(10)) === 0, lit(null))
          .otherwise(col("id") * 2).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("per-file min/max/nulls/rows match the data") {
    // key by basename: input_file_name() spells the scheme as
    // file:/// while Hadoop Path.toString uses file:/
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val mf = Manifest.build(spark, dir, Seq("k", "v")).collect()
      .map(r => (base(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toMap
    val actual = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"), min("k").as("mnk"), max("k").as("mxk"),
        sum(col("v").isNull.cast("long")).as("nv"),
        min("v").as("mnv"), max("v").as("mxv"))
      .collect()
    assert(actual.length === 4)
    actual.foreach { r =>
      val f = base(r.getString(0))
      val (rows, nulls, mn, mx) = mf((f, "k"))
      assert(rows === r.getLong(1) && nulls === 0L)
      assert(mn.get === r.getLong(2) && mx.get === r.getLong(3), f)
      val (vr, vn, vmn, vmx) = mf((f, "v"))
      assert(vr === r.getLong(1) && vn === r.getLong(4))
      assert(vmn.get === r.getLong(5) && vmx.get === r.getLong(6), f)
    }
  }

  test("pruning reads exactly the intersecting files; misses return " +
    "empty") {
    val mf = Manifest.build(spark, dir, Seq("k", "s"))
    // range inside one quarter of the range-partitioned layout
    val one = Manifest.prunedRead(spark, mf, "k", 10, 20)
    assert(one.select(input_file_name()).distinct().count() === 1)
    assert(one.count() === 11)
    // out-of-range: empty result, correct schema, no throw
    val none = Manifest.prunedRead(spark, mf, "k", 5000, 6000)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "s", "d", "v"))
  }

  test("string and double stats populate and prune their key types") {
    val mf = Manifest.build(spark, dir, Seq("s", "d")).cache()
    val sRows = mf.filter(col("column") === "s").collect()
    assert(sRows.length === 4)
    // string stats live in min_s/max_s (cols 8/9); typed slots null
    sRows.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(6), "long/double slots must be null")
      assert(r.getString(8) < r.getString(9))
    }
    // string-range pruning: s0010..s0020 is inside one of 4 files
    val one = Manifest.prunedReadString(spark, mf, "s", "s0010", "s0020")
    assert(one.inputFiles.length === 1)
    assert(one.count() === 11)
    val noneS = Manifest.prunedReadString(spark, mf, "s", "t", "u")
    assert(noneS.inputFiles.length === 0 || noneS.count() === 0)
    // double-range pruning: d = id * 0.5, so [5.0, 10.0] = ids 10..20
    val oneD = Manifest.prunedReadDouble(spark, mf, "d", 5.0, 10.0)
    assert(oneD.inputFiles.length === 1)
    assert(oneD.count() === 11)
    mf.unpersist()
  }

  test("string truncation keeps bounds valid: lower truncates, upper " +
    "increments") {
    val cap = Manifest.StringStatCap
    val longLo = "a" * (cap + 10)
    val longHi = "b" * (cap + 10)
    assert(Manifest.truncLower(longLo) === "a" * cap)
    assert(Manifest.truncLower(longLo) <= longLo) // valid lower bound
    val up = Manifest.truncUpper(longHi).get
    assert(up.length <= cap && up > longHi) // valid upper bound
    // all-max prefix: no valid increment — poison (None)
    assert(Manifest.truncUpper("￿" * (cap + 1)).isEmpty)
    // short strings pass through both untouched
    assert(Manifest.truncLower("abc") === "abc")
    assert(Manifest.truncUpper("abc") === Some("abc"))
    // SURROGATE hazards: incrementing must never leave an unpaired
    // surrogate (Catalyst's UTF-8 encoder rewrites those to '?', a
    // bound SMALLER than the data — silent row loss on prune)
    // 1. kept prefix ends on a high surrogate (truncation split an
    //    emoji): skip it, increment the previous char
    val emoji = "a" * (cap - 1) + new String(Character.toChars(0x1F600)) +
      "tail"
    val u1 = Manifest.truncUpper(emoji).get
    assert(u1 === "a" * (cap - 2) + "b", s"got ${u1.length} chars")
    assert(u1 > emoji.substring(0, cap - 1)) // still dominates the prefix
    assert(!u1.exists(Character.isSurrogate))
    // 2. char just below the surrogate range (U+D7FF): incrementing
    //    would ENTER it — must skip left
    val edge = "x" * (cap - 1) + '퟿' + "tail"
    val u2 = Manifest.truncUpper(edge).get
    assert(u2 === "x" * (cap - 2) + "y")
    assert(!u2.exists(Character.isSurrogate))
    // 3. nothing incrementable at all: poison
    assert(Manifest.truncUpper("퟿" * (cap + 1)).isEmpty)
  }

  test("update: footer-reads ONLY the delta, equals a full rebuild, " +
    "and drops vacuumed files") {
    val d2 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-incr-${ProcessHandle.current().pid()}").toString
    spark.range(500)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d2)
    val m1 = Manifest.build(spark, d2, Seq("k")).cache()
    assert(m1.count() === 4)
    spark.range(500, 1000)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
      .write.mode("append").parquet(d2)
    // delta-cost proof: run the update through the counting FileSystem
    // — only the 2 appended files' footers may be opened
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftest.impl", classOf[GraftTestFs].getName)
    hc.setBoolean("fs.graftest.impl.disable.cache", true)
    val m2 =
      try {
        GraftTestFs.opens.clear()
        val mPre = m1.collect() // old manifest rows, plain local paths
        // re-home the old rows under the counting scheme using Hadoop's
        // own Path normalization (hand-built "scheme://" strings don't
        // match listStatus output and would defeat the known-file check)
        val m1g = spark.createDataFrame(
          java.util.Arrays.asList(mPre.map(r => org.apache.spark.sql.Row(
            new org.apache.hadoop.fs.Path("graftest://" +
              r.getString(0).stripPrefix("file:")).toString +:
              r.toSeq.tail: _*)): _*), m1.schema)
        val out = Manifest.update(spark, "graftest://" + d2, m1g, Seq("k"))
          .cache()
        assert(out.count() === 6)
        val opened = GraftTestFs.opens.keySet()
        assert(opened.size() === 2,
          s"update opened ${opened.size()} data files, expected the " +
            s"2-file delta: $opened")
        out
      } finally {
        hc.unset("fs.graftest.impl")
        hc.unset("fs.graftest.impl.disable.cache")
      }
    // content equality with a full rebuild (modulo the path scheme)
    val rebuilt = Manifest.build(spark, d2, Seq("k")).collect()
      .map(r => r.toSeq.tail.toList -> r.getString(0).split("/").last)
      .toSet
    val updated = m2.collect()
      .map(r => r.toSeq.tail.toList -> r.getString(0).split("/").last)
      .toSet
    assert(updated === rebuilt)
    // no-op update carries rows forward without new footer work
    // (cached: like build, update is lazy — acting on it after files
    // vanish would replay footer reads into FileNotFound)
    val m3 = Manifest.update(spark, d2, Manifest.build(spark, d2, Seq("k")),
      Seq("k")).cache()
    assert(m3.count() === 6)
    // vacuum: delete one file — its rows must drop and pruning stays sane
    val victim = new java.io.File(d2).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val victimName = victim.getName
    assert(victim.delete())
    val m4 = Manifest.update(spark, d2, m3, Seq("k"))
    assert(m4.count() === 5)
    assert(m4.filter(col("file").contains(victimName)).count() === 0)
    // tracked-column mismatch fails loudly
    intercept[IllegalArgumentException] {
      Manifest.update(spark, d2, m4, Seq("k", "v"))
    }
    m1.unpersist(); m2.unpersist(); ()
  }

  test("string bounds merge in UTF-8 byte order across row groups: " +
    "supplementary vs high-BMP data cannot undercut the max") {
    // UTF-16 code-unit order (java.lang.String) puts the surrogate
    // pair of U+1F600 (0xD83D...) BELOW U+F000, but UTF-8 byte order
    // (parquet stats, Spark UTF8String) puts the 4-byte U+1F600
    // (0xF0 lead) ABOVE the 3-byte U+F000 (0xEF lead). A String-order
    // merge across row groups would store max_s = "..." while
    // the file CONTAINS byte-wise larger emoji rows — and a pruned
    // read for those rows would silently skip the file (row loss).
    val d3 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-supp-${ProcessHandle.current().pid()}").toString
    val emoji = new String(Character.toChars(0x1F600)) // 😀 U+1F600
    val pad = "p" * 1024 // big rows + tiny block size => >1 row group
    spark.range(300)
      .select(col("id").as("k"),
        when(col("id") < 150, concat(lit("\uF000"), lit(pad)))
          .otherwise(concat(lit(emoji), lit(pad))).as("s"))
      .orderBy("id").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", "1024")
      .option("parquet.page.size", "1024")
      .parquet(d3)
    // precondition: the single file really has multiple row groups
    // (otherwise this test degrades to the single-group case)
    val f = new java.io.File(d3).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        spark.sparkContext.hadoopConfiguration))
    val nGroups = try reader.getRowGroups.size() finally reader.close()
    assert(nGroups >= 2, s"fixture needs >=2 row groups, got $nGroups")
    val mf = Manifest.build(spark, d3, Seq("s"))
    val row = mf.filter(col("column") === "s").collect()(0)
    val maxS = row.getString(9)
    // byte-order max starts with the emoji; UTF-16-order would have
    // picked the  rows
    assert(maxS.startsWith(emoji),
      s"max_s merged in the wrong order: ${maxS.take(4).toList}")
    assert(row.getString(8).startsWith("\uF000")) // min is the BMP row
    // and the pruned read for the emoji rows finds them (no row loss)
    val hit = Manifest.prunedReadString(spark, mf, "s",
      emoji, emoji + "￿")
    assert(hit.count() === 150)
  }

  test("strict UTF-8 decode poisons malformed stat bytes; byte order " +
    "is unsigned") {
    // well-formed round-trips
    assert(Manifest.decodeUtf8Strict("abc".getBytes(UTF_8)) === Some("abc"))
    val emoji = new String(Character.toChars(0x1F600))
    assert(Manifest.decodeUtf8Strict(emoji.getBytes(UTF_8)) === Some(emoji))
    // a 4-byte sequence truncated mid code point (writer-side stat
    // truncation) must poison, not decode to U+FFFD
    val full = emoji.getBytes(UTF_8)
    assert(Manifest.decodeUtf8Strict(full.take(2)) === None)
    // a lone 0xFF (never valid UTF-8) poisons
    assert(Manifest.decodeUtf8Strict(Array(0xFF.toByte)) === None)
    // unsigned order: 0xF0-lead sorts ABOVE 0x7F ASCII despite being
    // negative as a signed byte
    assert(Manifest.utf8Lte("a".getBytes(UTF_8), full))
    assert(!Manifest.utf8Lte(full, "a".getBytes(UTF_8)))
    // prefix sorts below its extension; equal arrays are <=
    assert(Manifest.utf8Lte("ab".getBytes(UTF_8), "abc".getBytes(UTF_8)))
    assert(Manifest.utf8Lte("ab".getBytes(UTF_8), "ab".getBytes(UTF_8)))
  }

  test("timestamp pruning reads only intersecting files and keeps the " +
    "exact slice") {
    val d4 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-ts-${ProcessHandle.current().pid()}").toString
    // pin micros for the fixture write, restore after (the session is
    // shared across suites — a leaked conf would change how every
    // later test encodes timestamps)
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val tsPrev = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    // 1000 rows, one per hour from 2024-01-01T00:00Z, 4 range files
    try spark.range(1000)
      .select(col("id").as("k"),
        timestamp_micros(lit(1704067200000000L) +
          col("id") * 3600000000L).as("ts"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d4)
    finally tsPrev match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }
    val mf = Manifest.build(spark, d4, Seq("ts"))
    // hours 100..200 live in the first of 4 files
    val lo = 1704067200000000L + 100L * 3600000000L
    val hi = 1704067200000000L + 200L * 3600000000L
    val one = Manifest.prunedReadTimestamp(spark, mf, "ts", lo, hi)
    assert(one.inputFiles.length === 1)
    assert(one.count() === 101)
    // out-of-range: empty, never a throw
    val none = Manifest.prunedReadTimestamp(spark, mf, "ts",
      1804067200000000L, 1804167200000000L)
    assert(none.count() === 0)
  }

  test("TIMESTAMP_MILLIS bounds normalize to micros: pruning keeps " +
    "the right files instead of skipping nearly everything") {
    val dm = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-tsmillis-${ProcessHandle.current().pid()}").toString
    // a non-default writer unit (outputTimestampType=TIMESTAMP_MILLIS):
    // footer INT64 stats are in MILLIS; before the normalization fix
    // the manifest compared them raw against MICRO ranges and skipped
    // ~every file — silent row loss the residual can't repair
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val tsPrev = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MILLIS")
    try spark.range(1000)
      .select(col("id").as("k"),
        timestamp_micros(lit(1704067200000000L) +
          col("id") * 3600000000L).as("ts"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dm)
    finally tsPrev match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }
    val mf = Manifest.build(spark, dm, Seq("ts"))
    // bounds must be micros: hour 0 .. hour 999
    val mn = mf.agg(min("min")).collect()(0).getLong(0)
    val mx = mf.agg(max("max")).collect()(0).getLong(0)
    assert(mn === 1704067200000000L, s"min not micro-normalized: $mn")
    assert(mx === 1704067200000000L + 999L * 3600000000L)
    // the micros range for hours 100..200 must keep exactly 1 of 4
    // files and return the exact slice
    val lo = 1704067200000000L + 100L * 3600000000L
    val hi = 1704067200000000L + 200L * 3600000000L
    val one = Manifest.prunedReadTimestamp(spark, mf, "ts", lo, hi)
    assert(one.inputFiles.length === 1)
    assert(one.count() === 101)
  }

  test("update rejects a pre-flen/mtime manifest with an explicit " +
    "rebuild message") {
    val legacy = spark.range(4).select(
      concat(lit("file:///x/part-"), col("id")).as("file"),
      lit("k").as("column"), lit(10L).as("rows"),
      lit(0L).as("nulls"), lit(0L).as("min"), lit(9L).as("max"),
      lit(null).cast("double").as("min_d"),
      lit(null).cast("double").as("max_d"),
      lit(null).cast("string").as("min_s"),
      lit(null).cast("string").as("max_s"))
    val e = intercept[IllegalArgumentException] {
      Manifest.update(spark, dir, legacy, Seq("k"))
    }
    assert(e.getMessage.contains("rebuild"),
      s"no rebuild hint: ${e.getMessage}")
  }

  test("format guard: an r15-shaped manifest (flen/mtime present, no " +
    "format column — bounds possibly raw-millis) rejects on update AND " +
    "pruned reads; mixed formats reject on update") {
    // flen/mtime present, so the presence guard alone would PASS it —
    // exactly the carried-forward millis-bounds hazard
    val r15ish = spark.range(4).select(
      concat(lit("file:///x/part-"), col("id")).as("file"),
      lit("k").as("column"), lit(10L).as("rows"),
      lit(0L).as("nulls"), lit(0L).as("min"), lit(9L).as("max"),
      lit(null).cast("double").as("min_d"),
      lit(null).cast("double").as("max_d"),
      lit(null).cast("string").as("min_s"),
      lit(null).cast("string").as("max_s"),
      lit(100L).as("flen"), lit(1L).as("mtime"))
    val e1 = intercept[IllegalArgumentException] {
      Manifest.update(spark, dir, r15ish, Seq("k"))
    }
    assert(e1.getMessage.contains("rebuild"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Manifest.prunedRead(spark, r15ish, "k", 0, 5)
    }
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
    // a future-format row mixed in must also reject — bound semantics
    // may differ per version
    val mixed = Manifest.build(spark, dir, Seq("k"))
      .unionByName(Manifest.build(spark, dir, Seq("k"))
        .limit(1).withColumn("format", lit(99)))
    val e3 = intercept[IllegalArgumentException] {
      Manifest.update(spark, dir, mixed, Seq("k"))
    }
    assert(e3.getMessage.contains("rebuild"), e3.getMessage)
    // the current build's own manifest passes both paths
    val ok = Manifest.build(spark, dir, Seq("k"))
    assert(ok.columns.contains("format"))
    assert(Manifest.update(spark, dir, ok, Seq("k")).count() === ok.count())
  }

  test("prunedReadMulti intersects keep-sets and ANDs residuals") {
    val d6 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-multi-${ProcessHandle.current().pid()}").toString
    // grid layout: 4 files = 2 k-ranges × 2 g-values, so each single
    // column prunes to 2 files and the conjunction to exactly 1
    spark.range(1000)
      .select(col("id").as("k"), (col("id") % 2).as("g"),
        when(col("id") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("v"))
      .withColumn("cell", (col("k") >= 500).cast("int") * 2 + col("g"))
      .repartitionByRange(4, col("cell"))
      .sortWithinPartitions("k")
      .drop("cell")
      .write.mode("overwrite").parquet(d6)
    val mf = Manifest.build(spark, d6, Seq("k", "g", "v"))
    assert(mf.select("file").distinct().count() === 4)
    val both = Manifest.prunedReadMulti(spark, mf, Seq(
      Manifest.LongRange("k", 0L, 499L), Manifest.LongRange("g", 1L, 1L)))
    assert(both.inputFiles.length === 1, "conjunction must reach 1 file")
    assert(both.count() ===
      spark.read.parquet(d6)
        .filter(col("k") <= 499 && col("g") === 1).count())
    // single-column prunes each keep 2 files — strictly worse
    assert(Manifest.prunedRead(spark, mf, "k", 0L, 499L)
      .inputFiles.length === 2)
    assert(Manifest.prunedRead(spark, mf, "g", 1L, 1L)
      .inputFiles.length === 2)
    // mixing a NotNull conjunct: same file set, nulls filtered
    val nn = Manifest.prunedReadMulti(spark, mf, Seq(
      Manifest.LongRange("k", 0L, 499L), Manifest.LongRange("g", 1L, 1L),
      Manifest.NotNull("v")))
    assert(nn.count() ===
      spark.read.parquet(d6).filter(col("k") <= 499 && col("g") === 1 &&
        col("v").isNotNull).count())
    // disjoint conjunction: empty result with the table's schema
    val none = Manifest.prunedReadMulti(spark, mf, Seq(
      Manifest.LongRange("k", 0L, 10L),
      Manifest.LongRange("k", 900L, 999L)))
    assert(none.count() === 0)
    assert(none.columns.toSet === Set("k", "g", "v"))
  }

  test("update re-footer-reads a file rewritten in place under the " +
    "same name") {
    val d5 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-rewrite-${ProcessHandle.current().pid()}").toString
    spark.range(100).select(col("id").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(d5)
    val m1 = Manifest.build(spark, d5, Seq("k")).cache()
    assert(m1.count() === 1)
    assert(m1.collect()(0).getLong(4) === 0L) // min k
    // rewrite the SAME part file with different data (a non-Spark
    // writer reusing the path): write elsewhere, copy bytes over
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-rewrite-src-${ProcessHandle.current().pid()}")
    spark.range(500, 777).select(col("id").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val victim = new java.io.File(d5).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val src = tmp.listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(src.toPath, victim.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the stale LocalFileSystem checksum shadow — a real
    // non-Spark in-place writer wouldn't leave one behind either
    new java.io.File(victim.getParentFile, "." + victim.getName + ".crc")
      .delete()
    // path unchanged, content changed — update must re-read, not carry
    val m2 = Manifest.update(spark, d5, m1, Seq("k"))
    val row = m2.collect()(0)
    assert(row.getLong(4) === 500L && row.getLong(5) === 776L,
      s"stale stats carried forward: ${row.toSeq}")
    m1.unpersist(); ()
  }

  test("executor footer reads use the JOB Hadoop conf, not a default " +
    "Configuration") {
    val hc = spark.sparkContext.hadoopConfiguration
    // register a custom scheme in the JOB conf only, cache disabled so
    // the driver's directory listing cannot pre-populate the shared
    // FileSystem cache and mask a default-Configuration regression
    hc.set("fs.graftest.impl", classOf[GraftTestFs].getName)
    hc.setBoolean("fs.graftest.impl.disable.cache", true)
    try {
      val mf = Manifest.build(spark, "graftest://" + dir, Seq("k"))
      // footer opens happened on executors under graftest:// — only
      // possible if the broadcast job conf reached them
      assert(mf.count() === 4)
      assert(mf.agg(sum("rows")).collect()(0).getLong(0) === 1000L)
    } finally {
      hc.unset("fs.graftest.impl")
      hc.unset("fs.graftest.impl.disable.cache")
    }
  }
}

package graft

import graft.operators.{SelectionOps, SetOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (FIXTURES.md §B ScalaCheck gens; reference analog:
  * hypothesis profile in pandas/conftest.py:5-25). ScalaCheck
  * generators driven with fixed seeds (no scalatestplus bridge in the
  * offline cache), invariant-style assertions per sample. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.chooseNum(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.chooseNum(0, 1000)
        k <- Gen.chooseNum(0, 5)
        v <- Gen.chooseNum(-100, 100).map(_ / 4.0)
      } yield (id, k, v))
    }

  private def samples(seedBase: Long, n: Int = 8): Seq[List[(Int, Int, Double)]] =
    (0 until n).map(i => rowsGen.pureApply(Gen.Parameters.default, Seed(seedBase + i)))

  test("dropDuplicates keep=first is idempotent and keeps min ord per key") {
    samples(100L).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((_, k, v), i) => (i, k, v) }
        .toDF("ord", "k", "v")
      val once = SelectionOps.dropDuplicates(df, Seq("k"), "first", Seq(col("ord")))
      val twice = SelectionOps.dropDuplicates(once, Seq("k"), "first", Seq(col("ord")))
      assert(once.count() == df.select("k").distinct().count())
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      val kept = once.select("k", "ord").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val mins = rows.indices.groupBy(i => rows(i)._2).view.mapValues(_.min).toMap
      assert(kept == mins)
    }
  }

  test("inner join row count equals sum over keys of count products") {
    samples(200L, 5).zip(samples(300L, 5)).foreach { case (l, r) =>
      val joined = l.toDF("id", "k", "v").select("k")
        .join(r.toDF("id", "k", "v").select("k"), Seq("k")).count()
      val lc = l.groupBy(_._2).view.mapValues(_.size).toMap
      val rc = r.groupBy(_._2).view.mapValues(_.size).toMap
      val expected = lc.map { case (k, n) => n.toLong * rc.getOrElse(k, 0) }.sum
      assert(joined == expected)
    }
  }

  test("set algebra invariants on distinct key sets") {
    samples(400L, 5).zip(samples(500L, 5)).foreach { case (a, b) =>
      val af = a.map(_._2).distinct.toDF("k")
      val bf = b.map(_._2).distinct.toDF("k")
      val u = SetOps.union(af, bf).count()
      val i = SetOps.intersection(af, bf).count()
      assert(u + i == af.count() + bf.count())
      val sd = SetOps.symmetricDifference(af, bf).count()
      assert(sd == SetOps.difference(af, bf).count() + SetOps.difference(bf, af).count())
    }
  }

  test("distributed top-k equals full-sort prefix") {
    samples(600L).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((_, _, v), i) => (i, v) }.toDF("id", "v")
      val k = math.min(5, rows.size)
      val topk = SelectionOps.nlargest(df, k, Seq("v"), Seq("id"))
        .select("id").as[Int].collect().toSeq
      val full = rows.zipWithIndex.map { case ((_, _, v), i) => (i, v) }
        .sortBy { case (i, v) => (-v, i) }.take(k).map(_._1)
      assert(topk == full)
    }
  }

  test("decimal-cast groupby sum matches in-memory exact sum") {
    samples(700L).foreach { rows =>
      val sparkSums = rows.toDF("id", "k", "v").groupBy("k")
        .agg(sum(col("v").cast("decimal(12,2)")).cast("double").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val mem = rows.groupBy(_._2).view.mapValues(g =>
        g.map(t => BigDecimal(t._3).setScale(2)).sum.toDouble).toMap
      assert(sparkSums == mem)
    }
  }

  test("property: DistScan running sums + rolling equal global windows") {
    import graft.operators.DistScan
    import org.apache.spark.sql.expressions.Window
    samples(4200L, n = 6).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((id, k, v), i) => (k.toLong, i.toLong, math.round(v * 4) * 25L) }
        .toDF("k", "id", "c")
      val ord = Seq(col("k"), col("id"))
      val buckets = 1 + rows.size % 7
      // cumulative sum
      val dist = DistScan.dropBuckets(DistScan.withRunningSums(
        df, col("k"), ord, Seq("cum" -> col("c")), buckets))
        .select(col("id"), col("cum").cast("long"))
      val w = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val global = df.select(col("id"), sum(col("c")).over(w))
      assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty,
        s"cumsum mismatch at buckets=$buckets n=${rows.size}")
      // rolling sum (window 4)
      val roll = DistScan.centRollingSum(df, ord, col("c"), n = 4,
        buckets = buckets).select(col("id"), col("roll_sum_cents"))
      val globalRoll = df.select(col("id"),
        sum(col("c")).over(w.rowsBetween(-3, 0)))
      assert(roll.exceptAll(globalRoll).isEmpty && globalRoll.exceptAll(roll).isEmpty,
        s"rolling mismatch at buckets=$buckets n=${rows.size}")
    }
  }

  test("property: withGlobalRowNumber is always a 1..n permutation") {
    import graft.operators.DistScan
    samples(7700L, n = 6).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((id, k, v), i) => (k, i.toLong, v) }.toDF("k", "id", "v")
      val (ranked, total) = DistScan.withGlobalRowNumber(df,
        Seq(col("v").desc_nulls_last, col("id").asc), "pos",
        buckets = 1 + rows.size % 5)
      assert(total == rows.size)
      val pos = ranked.select("pos").collect().map(_.getLong(0)).sorted
      assert(pos.toSeq == (1L to rows.size).toSeq, s"not a permutation: n=${rows.size}")
    }
  }

  test("searchsorted equals the scala reference on random data") {
    samples(500L, 5).foreach { rows =>
      val df = rows.toDF("id", "k", "v")
      val vs = rows.map(_._3)
      val probes = Seq(-30.0, 0.0, 12.25, 200.0)
      val got = SelectionOps.searchsorted(df, "v", probes)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      probes.foreach { p =>
        assert(got(p) == vs.count(_ < p).toLong, s"probe $p on $vs")
      }
      // side='right' counts <= ; difference = multiplicity of the probe
      val right = SelectionOps.searchsorted(df, "v", probes, side = "right")
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      probes.foreach { p =>
        assert(right(p) - got(p) == vs.count(_ == p).toLong)
      }
    }
  }

  test("property: anchored offset algebra invariants over random dates") {
    import graft.operators.Offsets
    val rnd = new scala.util.Random(41)
    val dates = (1 to 300).map(_ => java.time.LocalDate.ofEpochDay(
      8000 + rnd.nextInt(20000)).toString) // ~1991..2045
    import spark.implicits._
    val df = dates.toDF("s").select(col("s").cast("date").as("d"))

    def gather(c: org.apache.spark.sql.Column): Seq[java.time.LocalDate] =
      df.select(col("d"), c.as("x")).collect()
        .map(r => r.getDate(1).toLocalDate).toSeq
    val ds = dates.map(java.time.LocalDate.parse)

    // rollforward labels: at-or-after, idempotent, correct anchor
    val wk = gather(Offsets.weekAnchorLabel(col("d"), 3))
    ds.zip(wk).foreach { case (d, l) =>
      assert(!l.isBefore(d) && l.getDayOfWeek.getValue == 4) // Thursday
      assert(java.time.temporal.ChronoUnit.DAYS.between(d, l) < 7)
    }
    val qe = gather(Offsets.quarterEndLabel(col("d"), 2))
    ds.zip(qe).foreach { case (d, l) =>
      assert(!l.isBefore(d) && Set(2, 5, 8, 11)(l.getMonthValue))
      assert(l == l.`with`(java.time.temporal.TemporalAdjusters.lastDayOfMonth()))
    }

    // shifts: strictly after, correct anchor, within one period
    val sw = gather(Offsets.shiftWeek(col("d"), 0))
    ds.zip(sw).foreach { case (d, l) =>
      assert(l.isAfter(d) && l.getDayOfWeek.getValue == 1)
      assert(java.time.temporal.ChronoUnit.DAYS.between(d, l) <= 7)
    }
    val sme = gather(Offsets.shiftMonthEnd(col("d")))
    ds.zip(sme).foreach { case (d, l) =>
      assert(l.isAfter(d))
      assert(l == l.`with`(java.time.temporal.TemporalAdjusters.lastDayOfMonth()))
    }
    // negative shift is the left inverse direction: strictly before
    val smeN = gather(Offsets.shiftMonthEnd(col("d"), -1))
    ds.zip(smeN).foreach { case (d, l) => assert(l.isBefore(d)) }
    // business day: strictly after, never weekend, within 3 days bare
    val bd = gather(Offsets.shiftBusinessDay(col("d")))
    ds.zip(bd).foreach { case (d, l) =>
      assert(l.isAfter(d) && l.getDayOfWeek.getValue <= 5)
      assert(java.time.temporal.ChronoUnit.DAYS.between(d, l) <= 3)
    }
  }

  test("hashSplit is exhaustive, deterministic, and frequency-sane") {
    import graft.operators.SampleOps
    val n = 20000
    val df = (0 until n).map(_.toLong).toDF("id")
    val split = SampleOps.hashSplit(col("id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val counts = df.select(split.as("s")).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n) // every row labeled
    assert(math.abs(counts("train") - 0.75 * n) < 0.03 * n, counts.toString)
    assert(math.abs(counts("val") - 0.125 * n) < 0.02 * n, counts.toString)
    // determinism: same ids → identical assignment
    val a = df.select(col("id"), split.as("s")).collect().map(r => r.getLong(0) -> r.getString(1))
    val b = df.orderBy(col("id").desc).select(col("id"), split.as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.toMap == b.toMap)
  }

  test("feather round-trip preserves random frames across batch sizes") {
    import graft.sources.FeatherIo
    val cellGen: Gen[(Long, Option[Double], Option[String], Option[Boolean])] =
      for {
        id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
        d <- Gen.option(Gen.chooseNum(-1e12, 1e12))
        s <- Gen.option(Gen.oneOf(Gen.alphaNumStr.map(_.take(40)),
          Gen.const(""), Gen.const("héllo wörld \n\ttab")))
        b <- Gen.option(Gen.oneOf(true, false))
      } yield (id, d, s, b)
    val frameGen = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, cellGen))
    (0 until 6).foreach { i =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(4000L + i))
      val df = rows.toDF("id", "d", "s", "b")
      val dir = java.nio.file.Files.createTempDirectory("featherprop")
      dir.toFile.deleteOnExit()
      val path = dir.resolve(s"p$i.feather").toString
      FeatherIo.write(df, path, batchSize = 1 + i * 7) // 1, 8, 15, ...
      val back = FeatherIo.read(spark, path)
      assert(back.schema == df.schema)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        s"sample $i mismatch")
    }
  }

  test("stata round-trip preserves random frames across split sizes, " +
      "modulo the format's own transforms (int width, \"\" missing)") {
    import graft.sources.StataIo
    // doubles stay below the missing sentinel (8.988e307); timestamps are
    // ms-aligned (%tc is a millisecond serial — sub-ms needs |year|≲2038
    // for exact µs, the same envelope pandas has)
    val cellGen: Gen[(Long, Option[Double], Option[String], Option[Long],
        Option[Boolean])] =
      for {
        id <- Gen.chooseNum(-2147483647L, 2147483620L)
        d <- Gen.option(Gen.chooseNum(-1e300, 1e300))
        s <- Gen.option(Gen.oneOf(Gen.alphaNumStr.map(_.take(40)),
          Gen.const(""), Gen.const("héllo wörld…")))
        ms <- Gen.option(Gen.chooseNum(-1000000000000L, 2000000000000L))
        b <- Gen.option(Gen.oneOf(true, false))
      } yield (id, d, s, ms, b)
    val frameGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, cellGen))
    (0 until 6).foreach { i =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(5000L + i))
      val df = rows.toDF("id", "d", "s", "ms", "b")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val dir = java.nio.file.Files.createTempDirectory("stataprop")
      dir.toFile.deleteOnExit()
      val path = dir.resolve(s"p$i.dta").toString
      StataIo.write(df, path)
      val back = StataIo.read(spark, path, splitBytes = 1L + i * 97)
      // dta transforms: int64-in-range → int32, missing string → "",
      // boolean → byte 0/1
      val expected = df.select(col("id").cast("int"), col("d"),
        coalesce(col("s"), lit("")).as("s"), col("b").cast("byte").as("b"),
        col("ts"))
      val got = back.select("id", "d", "s", "b", "ts")
      assert(got.schema.map(f => (f.name, f.dataType)) ==
        expected.schema.map(f => (f.name, f.dataType)), got.schema.treeString)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"sample $i mismatch")
    }
  }

  test("excel round-trip preserves random frames (nulls sparse, ms " +
      "timestamps on Excel serials)") {
    import graft.sources.ExcelIo
    val cellGen: Gen[(Long, Option[Double], Option[String], Option[Long],
        Option[Boolean])] =
      for {
        id <- Gen.chooseNum(-1000000000L, 1000000000L)
        d <- Gen.option(Gen.chooseNum(-1e12, 1e12))
        s <- Gen.option(Gen.oneOf(Gen.alphaNumStr.map("x" + _.take(30)),
          Gen.const("é & <t> …")))
        ms <- Gen.option(Gen.chooseNum(-1000000000000L, 2000000000000L))
        b <- Gen.option(Gen.oneOf(true, false))
      } yield (id, d, s, ms, b)
    val frameGen = Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, cellGen))
    (0 until 6).foreach { i =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(8000L + i))
      // one full witness row so every column has a non-null for inference
      val df = (((1L, Some(0.5), Some("xseed"), Some(0L), Some(true))) +: rows)
        .toDF("id", "d", "s", "ms", "b")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val dir = java.nio.file.Files.createTempDirectory("excelprop")
      dir.toFile.deleteOnExit()
      val path = dir.resolve(s"p$i.xlsx").toString
      ExcelIo.write(df, path)
      val back = ExcelIo.read(spark, path)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)), back.schema.treeString)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        s"sample $i mismatch")
    }
  }

  test("xport round-trip preserves random frames across split sizes, " +
      "modulo the format's single numeric type") {
    import graft.sources.SasXportIo
    val cellGen: Gen[(Long, Option[Double], Option[String], Option[Long])] =
      for {
        id <- Gen.chooseNum(-1000000000L, 1000000000L)
        d <- Gen.option(Gen.chooseNum(-1e70, 1e70))
        s <- Gen.option(Gen.oneOf(Gen.alphaNumStr.map(_.take(20)),
          Gen.const(""), Gen.const("café")))
        ms <- Gen.option(Gen.chooseNum(-1000000000000L, 2000000000000L))
      } yield (id, d, s, ms)
    val frameGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, cellGen))
    (0 until 6).foreach { i =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(9000L + i))
      val df = rows.toDF("ID", "D", "S", "MS")
        .withColumn("TS", timestamp_millis(col("MS"))).drop("MS")
      val dir = java.nio.file.Files.createTempDirectory("xportprop")
      dir.toFile.deleteOnExit()
      val path = dir.resolve(s"p$i.xpt").toString
      SasXportIo.write(df, path)
      val back = SasXportIo.read(spark, path, splitBytes = 1L + i * 131)
      // xport transforms: int64 → exact double, missing string → ""
      val expected = df.select(col("ID").cast("double"), col("D"),
        coalesce(col("S"), lit("")).as("S"), col("TS"))
      val got = back.select("ID", "D", "S", "TS")
      assert(got.schema.map(f => (f.name, f.dataType)) ==
        expected.schema.map(f => (f.name, f.dataType)), got.schema.treeString)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"sample $i mismatch")
    }
  }

  test("html round-trip preserves random frames (empty string and null " +
      "both read as null — the format's empty-cell encoding)") {
    import graft.sources.HtmlIo
    val cellGen: Gen[(Long, Option[Double], Option[String], Option[Boolean])] =
      for {
        id <- Gen.chooseNum(-100000000000000000L, 100000000000000000L)
        d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e12, 1e12),
          Gen.const(Double.NaN), Gen.const(4.0)))
        s <- Gen.option(Gen.oneOf(Gen.alphaNumStr.map("x" + _.take(30)),
          Gen.const("a & <b> \"q\" …"), Gen.const("in  ner\tkept")))
        b <- Gen.option(Gen.oneOf(true, false))
      } yield (id, d, s, b)
    val frameGen = Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, cellGen))
    (0 until 6).foreach { i =>
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(6000L + i))
      // textual inference needs one non-null witness per column
      val df = (((1L, Some(0.5), Some("xseed"), Some(true))) +: rows)
        .toDF("id", "d", "s", "b")
      val dir = java.nio.file.Files.createTempDirectory("htmlprop")
      dir.toFile.deleteOnExit()
      val path = dir.resolve(s"p$i.html").toString
      HtmlIo.write(df, path)
      val back = HtmlIo.read(spark, path)
      // generated strings carry no OUTER whitespace (parse trims it);
      // inner runs and tabs must survive verbatim
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)), back.schema.treeString)
      assert(back.exceptAll(df).isEmpty &&
        df.exceptAll(back).isEmpty, s"sample $i mismatch")
    }
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 9).map(i => s"w$i")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("corpusDiff status matches a driver replay over random versions") {
    (0 until 6).foreach { s =>
      val texts = (0 until 30).map(i =>
        i.toLong -> textGen.pureApply(Gen.Parameters.default, Seed(900L + s * 100 + i)))
      val oldRows = texts.filter(_._1 % 3 != 0)
      val newRows = texts.filter(_._1 % 4 != 0)
        .map { case (id, t) => (id, if (id % 5 == 0) t + " extra" else t) }
      val out = graft.llm.TextDedupOps.corpusDiff(
        oldRows.toDF("id", "text"), newRows.toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      def norm(t: String) =
        t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      val o = oldRows.toMap; val n = newRows.toMap
      val expected = (o.keySet ++ n.keySet).map { id =>
        id -> ((o.get(id), n.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) =>
            if (norm(a) == norm(b)) "unchanged" else "changed"
          case _ => sys.error("unreachable")
        })
      }.toMap
      assert(out == expected, s"seed $s")
    }
  }

  test("backoffMatchLevels partitions positions and matches a driver replay") {
    (0 until 6).foreach { s =>
      val texts = (0 until 25).map(i =>
        i.toLong -> textGen.pureApply(Gen.Parameters.default, Seed(2000L + s * 100 + i)))
      val docs = texts.toDF("id", "text")
      val refRows = texts.filter(_._1 % 2 == 0)
      val out = graft.llm.LmOps.backoffMatchLevels(
        docs, refRows.toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      def words(t: String) = t.split("\\s+").filter(_.nonEmpty)
      val refW = refRows.map(t => words(t._2))
      def grams(n: Int) = refW.flatMap(w =>
        w.sliding(n).filter(_.length == n).map(_.mkString(" "))).toSet
      val (t3, t2, t1) = (grams(3), grams(2), grams(1))
      texts.foreach { case (id, t) =>
        val w = words(t)
        val lv = (3 to w.length).map { i =>
          val tg = w.slice(i - 3, i).mkString(" ")
          val bg = w.slice(i - 2, i).mkString(" ")
          if (t3(tg)) 3 else if (t2(bg)) 2 else if (t1(w(i - 1))) 1 else 0
        }
        val exp = (lv.size.toLong, lv.count(_ == 3).toLong,
          lv.count(_ == 2).toLong, lv.count(_ == 1).toLong,
          lv.count(_ == 0).toLong)
        assert(out(id) == exp, s"seed $s id $id text '$t'")
        // the levels always partition the position count
        val (np, l3, l2, l1, oov) = out(id)
        assert(l3 + l2 + l1 + oov == np)
      }
    }
  }

  test("property: packPaddedByLength equals the sequential reference " +
      "on random corpora") {
    import graft.operators.SampleOps
    val gen: Gen[List[Long]] = Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 64L))
    }
    val seqLen = 64L
    (0 until 6).foreach { s =>
      val toks = gen.pureApply(Gen.Parameters.default, Seed(4200L + s))
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tok")
      val got = SampleOps.packPaddedByLength(docs, "doc_id", "n_tok", seqLen)
        .select("doc_id", "slot", "seq_id", "seq_pos")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // sequential reference: per slot class, ids in (hashU32, id)
      // order fill capacity-sized windows
      def hash(id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:pack".getBytes("UTF-8"))
        java.lang.Long.parseLong(
          md.take(4).map(b => f"$b%02x").mkString, 16)
      }
      def slotOf(t: Long): Long =
        Iterator.iterate(1L)(_ * 2).find(_ >= t).get
      val expect = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, t, slotOf(t)) }
        .groupBy(_._3).flatMap { case (slot, rows) =>
          val cap = seqLen / slot
          rows.sortBy(r => (hash(r._1), r._1)).zipWithIndex.map {
            case ((id, _, _), rn) =>
              id -> (slot, rn.toLong / cap, rn.toLong % cap)
          }
        }
      assert(got == expect, s"seed $s")
    }
  }

  test("applyChanges equals a sequential driver-side fold on random " +
    "change feeds") {
    import graft.operators.MergeOps
    val feedGen: Gen[List[(Long, String, String, Long)]] =
      Gen.chooseNum(1, 30).flatMap { n =>
        Gen.listOfN(n, for {
          k <- Gen.chooseNum(0L, 6L)
          op <- Gen.oneOf("U", "U", "U", "D") // deletes rarer
          v <- Gen.chooseNum(0, 99)
        } yield (k, s"v$v", op, 0L))
      }
    (0 until 6).foreach { i =>
      val raw = feedGen.pureApply(Gen.Parameters.default, Seed(900L + i))
        .zipWithIndex.map { case ((k, v, op, _), seq) => (k, v, op, seq.toLong) }
      val target = (0L to 3L).map(k => (k, s"init$k")).toDF("k", "name")
      val changes = raw.toDF("k", "name", "op", "seq")
      val got = MergeOps.applyChanges(target, changes, Seq("k"), "op", "seq")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // reference: fold the feed in seq order over the target map
      val expect = raw.sortBy(_._4).foldLeft(
        (0L to 3L).map(k => k -> s"init$k").toMap) {
        case (m, (k, v, op, _)) =>
          if (op == "D") m - k else m + (k -> v)
      }
      assert(got === expect, s"sample $i")
    }
  }

  test("fuzzyPairs (uncapped) equals brute-force levenshtein filtering " +
    "on random corpora whenever a shared gram exists") {
    import graft.llm.TextDedupOps
    val strGen: Gen[List[String]] = Gen.chooseNum(3, 12).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(3, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)))
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    def grams(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    (0 until 5).foreach { it =>
      val strs = strGen.pureApply(Gen.Parameters.default, Seed(7100L + it))
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = TextDedupOps.fuzzyPairs(strs.toDF("id", "s"), "id", "s",
        maxDist = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib && grams(sa).intersect(grams(sb)).nonEmpty
        d = lev(sa, sb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got === expect, s"sample $it")
    }
  }

  test("epochShuffle: layout-invariant permutation, seeds decorrelate, " +
    "shards exactly equal") {
    import graft.operators.SampleOps
    val ids = (0L until 240L).toDF("id")
    def perm(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      SampleOps.epochShuffle(df, "id", seed, 6, buckets = 4)
        .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    val p7a = perm(ids, 7L)
    val p7b = perm(ids.repartition(13), 7L) // layout must not matter
    val p8 = perm(ids, 8L)
    assert(p7a == p7b, "permutation depends on physical layout")
    assert(p7a != p8, "different seeds gave the same permutation")
    assert(p7a.sorted == (0L until 240L), "not a permutation")
    // decorrelation: the two epoch orders agree on few positions
    val agree = p7a.zip(p8).count { case (a, b) => a == b }
    assert(agree < 24, s"seeds 7 and 8 agree on $agree/240 positions")
    val sizes = SampleOps.epochShuffle(ids, "id", 7L, 6, buckets = 4)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == (1 to 6).map(_ -> 40L).toMap, sizes.toString)
    // shards are CONTIGUOUS pos ranges (seekable layout)
    val byShard = SampleOps.epochShuffle(ids, "id", 7L, 6, buckets = 4)
      .select("shard", "pos").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    byShard.foreach { case (sh, ps) =>
      assert(ps.last - ps.head + 1 == ps.length, s"shard $sh not contiguous")
    }
  }

  test("property: byte-fallback BPE ids ARE the UTF-8 bytes, and " +
    "decode ∘ encode is the identity, on arbitrary unicode") {
    import graft.llm.TextStatsOps
    // arbitrary strings incl. whitespace, the six marker letters,
    // multi-byte cps, and supplementary-plane chars
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '', '', '\r'),
      2 -> Gen.oneOf('Ġ', 'ĉ', 'Ċ', 'ċ', 'Č', 'č', 'ā', 'é', '汉', '語'),
      1 -> Gen.oneOf("😀", "🚀", "𝕏").map(_.charAt(0)), // lone surrogate
      1 -> Gen.oneOf('<', '>', '0', 'x', '.', ',', '\''))
    val textGen = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val texts = (0 until 24).map(i =>
      textGen.pureApply(Gen.Parameters.default, Seed(4200L + i)))
      // unpaired surrogates UTF-8-encode as '?' on BOTH sides of the
      // comparison — sanitize so the identity is over real unicode
      .map(s => new String(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.UTF_8))
      .filter(_.nonEmpty)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // EMPTY vocab + no merges: every symbol rides the byte alphabet,
    // so the id stream per document must BE the UTF-8 bytes of the
    // original text (whitespace markers unmark to the whitespace's
    // own byte; pre-escaped genuine marker letters contribute their
    // real multi-byte sequences)
    val enc = TextStatsOps.bpeEncodeRanked(docs, "doc_id", "text",
      merges = Seq((" ", " ")), vocabIds = Map.empty,
      byteLevel = true, byteFallback = true)
    val ids = enc.orderBy("doc_id", "tok_idx", "sym_idx")
      .select("doc_id", "token_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(_ & 0xff).toSeq
      assert(ids.getOrElse(i.toLong, Array.empty[Int]).toSeq == expect,
        s"ids != utf8 bytes for ${t.map(c => f"U+${c.toInt}%04X")}")
    }
    // and the decoder inverts it exactly
    val dec = TextStatsOps.bpeDecodeRanked(enc, "doc_id", Map.empty,
        byteFallback = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(dec(i.toLong) == t,
        s"decode(encode) != id for ${t.map(c => f"U+${c.toInt}%04X")}")
    }
    // with a REAL table too: merges + vocab, markers inside merged
    // symbols, still the identity
    val enc2 = TextStatsOps.bpeEncodeRanked(docs, "doc_id", "text",
      TextStatsOps.BpeDemoMerges, TextStatsOps.bpeVocab(),
      byteLevel = true, byteFallback = true)
    val dec2 = TextStatsOps.bpeDecodeRanked(enc2, "doc_id",
        TextStatsOps.bpeVocab(), byteFallback = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(dec2(i.toLong) == t, s"table roundtrip broke on doc $i")
    }
    // unigram twin: rows + byte fallback decode to the whitespace-
    // normalized text (words rejoined by single spaces) on the same
    // arbitrary unicode
    val uEnc = TextStatsOps.unigramEncodeRowsKernel(docs, "doc_id",
      "text", Map("a" -> -1000000L), unkCharMicro = -20000000L,
      maxTokenLen = 2, byteFallback = true)
    val uDec = TextStatsOps.unigramDecodeRows(uEnc, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val norm = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(uDec.getOrElse(i.toLong, "") == norm,
        s"unigram roundtrip broke on doc $i: " +
          s"${t.map(c => f"U+${c.toInt}%04X")}")
    }
  }
}

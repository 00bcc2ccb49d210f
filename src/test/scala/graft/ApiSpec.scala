package graft

import graft.core.PFrame
import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** PFrame pandas-surface API + skew-mitigation specs. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pf = PFrame(
    Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0),
      (5, "c", 50.0)).toDF("id", "k", "v"),
    indexCols = Seq("id"))

  test("query() grammar through the PFrame API") {
    val out = pf.query("v > @lo and k in ['a', 'b']", Map("lo" -> 15.0))
      .df.select("id").as[Int].collect().toSet
    assert(out == Set(2, 3, 4))
  }

  test("head/tail through the lazily materialized order column") {
    assert(pf.head(2).df.select("id").as[Int].collect().toSet == Set(1, 2))
    assert(pf.tail(2).df.select("id").as[Int].collect().toSet == Set(4, 5))
  }

  test("groupby builder: agg, transform, cumsum, nth, filterBySize") {
    val g = pf.groupby("k")
    val sums = g.sum("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("a" -> 30.0, "b" -> 70.0, "c" -> 50.0))

    val t = g.transform("gmax", max(col("v"))).df
      .select("id", "gmax").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(t(1) == 20.0 && t(3) == 40.0 && t(5) == 50.0)

    val c = g.cumsum("v", "cv").df.select("id", "cv")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(c(2) == 30.0 && c(4) == 70.0)

    assert(g.nth(1).df.select("id").as[Int].collect().toSet == Set(2, 4))
    assert(g.filterBySize(2).df.select("id").as[Int].collect().toSet == Set(1, 2, 3, 4))
  }

  test("merge/valueCounts/astype/dropna surface") {
    val other = PFrame(Seq(("a", 1), ("b", 2)).toDF("k", "rank"), Seq("k"))
    val m = pf.merge(other, Seq("k"), "left")
    assert(m.df.count() == 5)
    val vc = pf.valueCounts("k").df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vc == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(pf.astype("id" -> "string").df.schema("id").dataType.typeName == "string")
    val withNull = PFrame(
      Seq((1, Some(1.0)), (2, None)).toDF("id", "v"), Seq("id"))
    assert(withNull.dropna(subset = Seq("v")).df.count() == 1)
  }

  test("salted sum/count equals plain aggregation") {
    val df = (0 until 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 97}", i.toLong))
      .toDF("k", "v")
    val salted = SkewOps.saltedSumCount(df, Seq("k"), "v", 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("salted join preserves multiplicity") {
    val big = (0 until 5000).map(i => (if (i % 2 == 0) 1L else (i % 50).toLong, i))
      .toDF("key", "payload")
    val small = Seq((1L, "one"), (7L, "seven")).toDF("key", "name")
    val salted = SkewOps.saltedJoin(big, small, "key", 8)
    val plain = big.join(small, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("key").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      plain.groupBy("key").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("rolling/resample/ewm builder accessors realize correctly") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 40).map(i => (i % 2L, i.toLong, (i % 7).toDouble))
      .toDF("g", "seq", "v")
    val pf = PFrame(df, indexCols = Seq("seq"))

    // grouped rolling mean vs direct window
    val rolled = pf.groupby("g").rolling(3).mean("v", "rm").df
    val w = Window.partitionBy("g").orderBy("seq").rowsBetween(-2, 0)
    val direct = df.withColumn("rm",
      sum(col("v")).over(w) / count(col("v")).over(w))
    assert(rolled.select("seq", "rm").exceptAll(direct.select("seq", "rm")).isEmpty)

    // resample: tumbling buckets (Spark and pandas duration spellings)
    val ev = df.withColumn("ts",
      timestamp_micros(col("seq") * 60L * 1000000L))
    val res = PFrame(ev, Seq("seq")).resample("ts", "5 minutes").count().df
    assert(res.agg(sum("count")).collect()(0).getLong(0) == 40)
    val resP = PFrame(ev, Seq("seq")).resample("ts", "5min").count().df
    assert(resP.agg(sum("count")).collect()(0).getLong(0) == 40)

    // resample: anchored weekly rule through the same API
    val evDays = df.withColumn("ts",
      expr("timestamp_micros(CAST(1704067200000000 + seq * 86400000000 AS BIGINT))"))
    val resW = PFrame(evDays, Seq("seq")).resample("ts", "W-SUN").count().df
    assert(resW.agg(sum("count")).collect()(0).getLong(0) == 40)
    // every bucket label is a Sunday
    val dows = resW.select(dayofweek(col("bucket"))).collect().map(_.getInt(0))
    assert(dows.forall(_ == 1), dows.mkString(","))

    // rolling win_type: triangular weighted mean vs the direct formula
    val wm = pf.groupby("g").rolling(3).weightedMean("v", "wm", "triang").df
      .orderBy("seq").collect().map(r => Option(r.get(r.fieldIndex("wm"))))
    val rows = (1 to 40).map(i => (i % 2L, i.toLong, (i % 7).toDouble))
    val byG = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val wTri = graft.operators.WindowWeights.triang(3)
    val wantWm = rows.sortBy(_._2).map { case (g, seq, _) =>
      val vs = byG(g)
      val pos = rows.filter(_._1 == g).sortBy(_._2).indexWhere(_._2 == seq)
      if (pos < 2) None
      else Some(math.round((0 to 2).map(j => wTri(j) * vs(pos - 2 + j)).sum
        / wTri.sum * 1e6) / 1e6)
    }
    wm.zip(wantWm).zipWithIndex.foreach { case ((a, e), i) =>
      (a, e) match {
        case (Some(x: java.lang.Double), Some(y)) =>
          assert(math.abs(x - y) < 1e-9, s"row $i: $x vs $y")
        case (None, None) => ()
        case other => fail(s"row $i: $other")
      }
    }

    // grouped ewm equals the sequential recurrence
    val alpha = 0.4
    val got = PFrame(df, Seq("seq")).groupby("g").ewm(alpha)
      .mean("v", "e").df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = (1 to 40).map(i => (i % 2L, i.toLong, (i % 7).toDouble))
      .groupBy(_._1).view.mapValues { rows =>
        val vs = rows.sortBy(_._2).map(_._3)
        vs.tail.foldLeft(vs.head)((y, x) => (1 - alpha) * y + alpha * x)
      }.toMap
    want.foreach { case (g, e) => assert(math.abs(got(g) - e) < 1e-12) }
  }

  test("info and memory_usage report schema and plan stats without a scan") {
    val pf = PFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), Seq("id"))
    val txt = pf.info()
    assert(txt.contains("id: bigint") && txt.contains("s: string"))
    assert(pf.memoryUsage > 0)
  }

  test("filterCols / pop / squeeze / xs label operations") {
    val pf = PFrame(Seq((1L, 2.0, 3.0, "x")).toDF("id", "price_a", "price_b", "tag"),
      Seq("id"))
    assert(pf.filterCols(like = Some("price")).df.columns.toSeq ==
      Seq("id", "price_a", "price_b"))
    assert(pf.filterCols(regex = Some("^t")).df.columns.toSeq == Seq("id", "tag"))
    val (popped, rest) = pf.pop("tag")
    assert(popped.df.columns.toSeq == Seq("id", "tag"))
    assert(!rest.df.columns.contains("tag"))
    assert(popped.squeeze == Right("tag"))
    assert(pf.squeeze.isLeft)
    val multi = PFrame(Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"))
    val xs = multi.xs("k1", 1L)
    assert(xs.indexCols == Seq("k2") && xs.df.count() == 1)
  }

  test("divPandas yields ±inf/NaN where divNull yields null") {
    import graft.operators.MathCompat
    val df = Seq((1.0, 0.0), (-1.0, 0.0), (0.0, 0.0), (6.0, 2.0))
      .toDF("a", "b")
    val r = df.select(MathCompat.divPandas(col("a"), col("b")).as("p"),
      MathCompat.divNull(col("a"), col("b")).as("n")).collect()
    assert(r(0).getDouble(0).isPosInfinity && r(0).isNullAt(1))
    assert(r(1).getDouble(0).isNegInfinity)
    assert(r(2).getDouble(0).isNaN)
    assert(r(3).getDouble(0) == 3.0 && r(3).getDouble(1) == 3.0)
  }

  test("EngineConf options round-trip over spark.conf") {
    val conf = new graft.operators.EngineConf(spark)
    assert(conf.get("display.max_rows") == "20") // default
    conf.set("display.max_rows", "50")
    assert(conf.get("display.max_rows") == "50")
    conf.reset("display.max_rows")
    assert(conf.get("display.max_rows") == "20")
    assert(conf.get("compute.shuffle_partitions") == "4") // test session
  }

  test("swaplevel / droplevel / reorder_levels are metadata-only") {
    import graft.core.PFrame
    val df = Seq((1L, "a", 2.0)).toDF("k1", "k2", "v")
    val pf = PFrame(df, indexCols = Seq("k1", "k2"))
    assert(pf.swaplevel().indexCols == Seq("k2", "k1"))
    assert(pf.droplevel("k1").indexCols == Seq("k2"))
    assert(pf.reorderLevels(Seq("k2", "k1")).indexCols == Seq("k2", "k1"))
    // no plan change: same analyzed plan object semantics
    assert(pf.swaplevel().df eq pf.df)
    intercept[IllegalArgumentException](pf.droplevel("nope"))
    intercept[IllegalArgumentException](pf.reorderLevels(Seq("k1")))
  }
}

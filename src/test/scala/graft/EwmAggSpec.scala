package graft

import graft.functions.EwmAggregator
import org.apache.spark.sql.functions._

/** EwmAggregator (custom typed Aggregator) must equal the sequential
  * per-group recurrence regardless of row arrival order or partial-
  * aggregation splits. */
class EwmAggSpec extends SparkSpec {
  import spark.implicits._

  test("udaf-registered EWM equals the sequential recurrence") {
    val alpha = 0.3
    val rnd = new scala.util.Random(11)
    val rows = for (g <- 1 to 20; i <- 0 until 50)
      yield (g.toLong, i.toLong, math.round(rnd.nextDouble() * 10000) / 100.0)
    // shuffle arrival order to exercise sort-at-finish
    val df = rnd.shuffle(rows).toDF("g", "pos", "v").repartition(7)

    val ewm = udaf(new EwmAggregator(alpha))
    val got = df.groupBy("g")
      .agg(ewm(col("pos"), col("v")).as("ewma"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val want = rows.groupBy(_._1).map { case (g, grp) =>
      val vs = grp.sortBy(_._2).map(_._3)
      g -> vs.tail.foldLeft(vs.head)((y, x) => (1 - alpha) * y + alpha * x)
    }
    want.foreach { case (g, w) =>
      assert(math.abs(got(g) - w) < 1e-12, s"group $g: ${got(g)} vs $w")
    }
  }

  test("EwmMomentsAggregator matches forward-weight reference; corr in [-1,1]") {
    import graft.functions.EwmMomentsAggregator
    val alpha = 0.4
    val rnd = new scala.util.Random(23)
    val rows = for (g <- 1 to 10; i <- 0 until 40) yield
      (g.toLong, i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100 + i)
    val df = rnd.shuffle(rows).toDF("g", "pos", "x", "y").repartition(5)

    def run(stat: String, adjust: Boolean, bias: Boolean) = {
      val a = udaf(new EwmMomentsAggregator(alpha, adjust, bias, stat))
      df.groupBy("g").agg(a(col("pos"), col("x"), col("y")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }

    // forward-built reference weights (the aggregator builds them backward)
    def ref(g: Long, stat: String, adjust: Boolean, bias: Boolean): Double = {
      val grp = rows.filter(_._1 == g).sortBy(_._2)
      val n = grp.length
      val r = 1 - alpha
      val w = (0 until n).map(i =>
        if (adjust) math.pow(r, n - 1 - i)
        else if (i == 0) math.pow(r, n - 1) else alpha * math.pow(r, n - 1 - i))
      val sw = w.sum; val sw2 = w.map(v => v * v).sum
      val mx = w.zip(grp).map { case (wi, t) => wi * t._3 }.sum / sw
      val my = w.zip(grp).map { case (wi, t) => wi * t._4 }.sum / sw
      val cxy = w.zip(grp).map { case (wi, t) => wi * (t._3 - mx) * (t._4 - my) }.sum
      val cxx = w.zip(grp).map { case (wi, t) => wi * (t._3 - mx) * (t._3 - mx) }.sum
      val cyy = w.zip(grp).map { case (wi, t) => wi * (t._4 - my) * (t._4 - my) }.sum
      stat match {
        case "corr" => cxy / math.sqrt(cxx * cyy)
        case "var" => if (bias) cxx / sw else cxx / sw * sw * sw / (sw * sw - sw2)
        case _ => if (bias) cxy / sw else cxy / sw * sw * sw / (sw * sw - sw2)
      }
    }

    // parameterization identities (pandas window.py _get_alpha)
    import graft.functions.EwmParams
    assert(math.abs(EwmParams.fromCom(4.0) - 0.2) < 1e-15)
    assert(math.abs(EwmParams.fromSpan(9.0) - 0.2) < 1e-15)
    assert(math.abs(EwmParams.fromHalflife(1.0) - 0.5) < 1e-15)

    for (stat <- Seq("cov", "var", "corr"); adjust <- Seq(true, false)) {
      val got = run(stat, adjust, bias = false)
      got.foreach { case (g, v) =>
        val w = ref(g, stat, adjust, bias = false)
        assert(math.abs(v - w) <= 1e-9 * math.max(1.0, math.abs(w)),
          s"$stat adjust=$adjust group $g: $v vs $w")
        if (stat == "corr") assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12)
        if (stat == "var") assert(v >= 0.0)
      }
    }
  }
}

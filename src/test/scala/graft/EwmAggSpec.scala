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
}

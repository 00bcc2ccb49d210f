package graft

import org.apache.spark.sql.functions._

/** The 100 TB approximate tier (SURVEY §7 phase 11): sketch-based
  * variants that replace exact shuffles-of-everything at scale, bounded
  * against their exact counterparts here. Exact forms stay the oracle
  * default; these are the documented opt-ins.
  */
class ApproxSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within rsd of exact countDistinct") {
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx brackets the exact percentile") {
    val row = ev.agg(
      percentile(col("value"), lit(0.5)).as("exact"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx")).collect()(0)
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / math.max(1.0, math.abs(exact)) < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx exact regime: accuracy ≥ n returns the " +
      "ceil(p·n) nearest-rank element — the approx_quantile_sketch " +
      "gate's oracle convention") {
    import spark.implicits._
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val rows = ev.filter(col("event_type") === "click")
        .select(col("value")).as[Double].collect().sorted
      val n = rows.length
      val expected = rows(math.ceil(p * n).toInt - 1)
      val got = ev.filter(col("event_type") === "click")
        .agg(percentile_approx(col("value"), lit(p), lit(100000)))
        .collect()(0).getDouble(0)
      assert(got == expected, s"p=$p: $got vs rank element $expected")
    }
  }

  test("percentile_approx rank-error contract: observed rank within " +
      "n/accuracy of the target at a lossy accuracy") {
    import spark.implicits._
    val rows = ev.select(col("value")).as[Double].collect().sorted
    val n = rows.length
    val accuracy = 50
    val got = ev.agg(percentile_approx(col("value"), lit(0.5), lit(accuracy)))
      .collect()(0).getDouble(0)
    val rank = rows.count(_ <= got)
    assert(math.abs(rank - 0.5 * n) <= n.toDouble / accuracy + 1,
      s"rank $rank of $n outside ±n/$accuracy of the median target")
  }

  test("HLL sketch per group: mergeable partial distinct counts") {
    // hll_sketch_agg / hll_sketch_estimate: the re-aggregatable form —
    // at 100 TB you store sketches per partition/day and merge, never
    // re-scan raw data
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val total = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).collect()(0).getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(total - exact).toDouble / exact < 0.06,
      s"merged sketch $total vs exact $exact")
  }
}

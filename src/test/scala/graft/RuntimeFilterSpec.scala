package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB mechanism that turns
  * a selective dimension filter into a FACT-SIDE scan filter at
  * execution time (Spark's runtime filter framework): the filtered
  * creation side aggregates a bloom filter of its join keys, and the
  * application side's scan evaluates might_contain(key) BEFORE the
  * shuffle, dropping non-joining fact rows at the source. The size
  * thresholds that gate injection are production-scale (application
  * side ≥ 10 GB by default), so this spec lowers them to witness the
  * rewrite on test data — the assertion is that graft's plain
  * declarative join SHAPE is eligible for the rewrite, i.e. nothing in
  * the operator layer (hints, non-deterministic exprs, pre-projections)
  * blocks it. Conf mutations are restored afterward; the shared session
  * stays clean. */
class RuntimeFilterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom might_contain into the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")        // test data ≪ the 10 GB gate
      spark.conf.set(keys(2), "100MB")
      spark.conf.set(keys(3), "-1")       // force the shuffle-join path
      val ord = Tables.orders(spark, d)
        .filter(col("o_totalprice") > 200000)
      val li = Tables.lineitem(spark, d)
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no bloom runtime filter injected:\n${p.take(3000)}")
      // and it must sit on the FACT side's key, pre-shuffle
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom filter not applied to the fact key:\n${p.take(3000)}")
      // semantics unchanged by the rewrite
      val expected = li.join(ord.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      assertFrameEqual(j, expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

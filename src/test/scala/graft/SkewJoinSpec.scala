package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the runtime answer to hot join keys at
  * 100 TB (SCALE.md's standing claim for orders⋈lineitem-shaped
  * shuffle joins): when one partition of a sort-merge join is far
  * larger than the median, AQE splits it into multiple tasks and
  * duplicates the matching build rows. The production thresholds
  * (256 MB partitions) are invisible on test data, so this spec plants
  * a 50%-hot-key join, lowers the thresholds, and pins that the FINAL
  * adaptive plan actually took the split (`skew=true` on the SMJ) —
  * guarding against operator-layer changes (hints, repartitions,
  * non-equi residuals) that would silently disqualify skew handling.
  * Conf mutations are restored; the shared session stays clean. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("a 50%-hot-key shuffle join is split by AQE skew handling") {
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "true")
      spark.conf.set(keys(2), "1.2")
      spark.conf.set(keys(3), "20KB")
      spark.conf.set(keys(4), "10KB")
      spark.conf.set(keys(5), "false")
      spark.conf.set(keys(6), "-1")
      // 200k probe rows, half on ONE key; 200-row build side
      val probe = spark.range(0, 200000)
        .select(when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 200)
          .as("k"), col("id").as("v"))
      val build = spark.range(0, 200).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val j = probe.join(build, "k")
      // execute THIS QueryExecution (df.count() would plan a separate
      // aggregate query and leave j's adaptive plan unfinalized)
      val n = j.queryExecution.toRdd.count()
      assert(n == 200000L, s"join row count wrong: $n")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(500))
      assert(p.contains("SortMergeJoin(skew=true)") &&
          p.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

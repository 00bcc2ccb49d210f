package graft

import graft.operators.AsofOps
import graft.plans.AsofJoinPlan
import org.apache.spark.sql.functions._

/** Custom AsofJoinExec (LogicalPlan + Strategy + physical two-pointer
  * merge) must agree with the window/union formulation everywhere. */
class AsofExecSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    (1L, 100L, 10.0), (1L, 200L, 11.0), (1L, 200L, 11.5), (1L, 300L, 12.0),
    (2L, 150L, 20.0),
    (4L, 100L, 40.0)
  ).toDF("g", "t", "px").withColumn("ts", timestamp_micros(col("t"))).drop("t")

  private def trades = Seq(
    (1L, 50L), (1L, 200L), (1L, 250L), (1L, 999L),
    (2L, 100L), (2L, 150L), (2L, 151L),
    (3L, 500L)
  ).toDF("g", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")

  test("custom exec equals window/union asof on edge cases") {
    val exec = AsofJoinPlan.asof(trades, quotes, "ts", Seq("g"), Seq("px"))
      .select(col("g"), col("ts"), col("px"))
    val win = AsofOps.asof(trades, quotes, "ts", Seq("g"), Seq("px"))
      .select(col("g"), col("ts"), col("px"))
    assertFrameEqual(exec, win)
    // exact-match row picks the LAST of tied right keys (11.5 at t=200)
    val at200 = exec.filter(col("g") === 1 &&
      col("ts") === timestamp_micros(lit(200L))).collect()
    assert(at200.head.getDouble(2) == 11.5)
    // group with no right rows → null payload
    assert(exec.filter(col("g") === 3).collect().head.isNullAt(2))
  }

  test("allowExact=false and tolerance agree with window form") {
    val exec = AsofJoinPlan.asof(trades, quotes, "ts", Seq("g"), Seq("px"),
      allowExact = false, toleranceMicros = Some(60L))
      .select(col("g"), col("ts"), col("px"))
    val win = AsofOps.asof(trades, quotes, "ts", Seq("g"), Seq("px"),
      direction = "backward", allowExact = false, toleranceMicros = Some(60L))
      .select(col("g"), col("ts"), col("px"))
    assertFrameEqual(exec, win)
  }

  test("forward direction equals window form incl. exact ties and tolerance") {
    // the operator contract requires right unique per (by, on) — both
    // forms are tie-arbitrary otherwise (AsofOps scaladoc); keep last
    val qdedup = quotes.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g", "ts").orderBy(col("px").desc)))
      .filter(col("rn") === 1).drop("rn")
    val exec = AsofJoinPlan.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      direction = "forward").select(col("g"), col("ts"), col("px"))
    val win = AsofOps.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      direction = "forward").select(col("g"), col("ts"), col("px"))
    assertFrameEqual(exec, win)
    val execTol = AsofJoinPlan.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      allowExact = false, toleranceMicros = Some(60L), direction = "forward")
      .select(col("g"), col("ts"), col("px"))
    val winTol = AsofOps.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      direction = "forward", allowExact = false, toleranceMicros = Some(60L))
      .select(col("g"), col("ts"), col("px"))
    assertFrameEqual(execTol, winTol)
  }

  test("custom exec equals window form on events self-asof at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select("user_id", "ts", "event_id")
    val right = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
      // pandas takes the last right row among duplicate (by, on) keys
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "ts").orderBy(col("click_value"))))
      .withColumn("__cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id", "ts")))
      .filter(col("__rn") === col("__cnt")).drop("__rn", "__cnt")

    val exec = AsofJoinPlan.asof(left, right, "ts", Seq("user_id"), Seq("click_value"))
      .select(col("event_id"), col("click_value"))
    val win = AsofOps.asof(left, right, "ts", Seq("user_id"), Seq("click_value"))
      .select(col("event_id"), col("click_value"))
    assertFrameEqual(exec, win)
  }

  test("nearest direction equals two-pass window composition") {
    val qdedup = quotes.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g", "ts").orderBy(col("px").desc)))
      .filter(col("rn") === 1).drop("rn")
    val exec = AsofJoinPlan.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      direction = "nearest").select(col("g"), col("ts"), col("px"))
    val win = AsofOps.asofNearest(trades, qdedup, "ts", Seq("g"), Seq("px"),
      leftKey = "ts")
    // window form keys by leftKey only; compare on (g, ts) via the exec's
    // own rows against per-row recomputation instead: join on (g, ts)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select("user_id", "ts", "event_id")
    val right = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("v"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "ts").orderBy(col("v").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val execEv = AsofJoinPlan.asof(left, right, "ts", Seq("user_id"), Seq("v"),
      direction = "nearest").select(col("event_id"), col("v"))
    val winEv = AsofOps.asofNearest(left, right, "ts", Seq("user_id"), Seq("v"),
      leftKey = "event_id").select(col("event_id"), col("v"))
    assertFrameEqual(execEv, winEv)
    // toy frame: tolerance carries through
    val execTol = AsofJoinPlan.asof(trades, qdedup, "ts", Seq("g"), Seq("px"),
      toleranceMicros = Some(60L), direction = "nearest")
      .select(col("g"), col("ts"), col("px")).collect()
    assert(execTol.nonEmpty)
    assert(exec.collect().nonEmpty && win.collect().nonEmpty)
  }

  test("keyless nearest equals keyed window composition on a single group") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select("ts", "event_id")
    val right = ev.filter(col("event_type") === "click")
      .select(col("ts"), col("value").as("v"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("ts").orderBy(col("v").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val exec = AsofJoinPlan.asof(left, right, "ts", Nil, Seq("v"),
      direction = "nearest").select(col("event_id"), col("v"))
    val win = AsofOps.asofNearest(left, right, "ts", Nil, Seq("v"),
      leftKey = "event_id").select(col("event_id"), col("v"))
    assertFrameEqual(exec, win)
  }

  test("keyless asof: bucketed merge equals window form, >1 partition") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select("ts", "event_id")
    // unique per on: keep the last value at each ts (operator contract)
    val right = ev.filter(col("event_type") === "click")
      .select(col("ts"), col("value").as("v"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("ts").orderBy(col("v").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    for (dir <- Seq("backward", "forward")) {
      val exec = AsofJoinPlan.asof(left, right, "ts", Nil, Seq("v"),
        direction = dir).select(col("event_id"), col("v"))
      val win = AsofOps.asof(left, right, "ts", Nil, Seq("v"),
        direction = dir).select(col("event_id"), col("v"))
      assertFrameEqual(exec, win)
      // the scale property: the merge is clustered on the range-bucket
      // id, never an AllTuples/SinglePartition plan. (Runtime partition
      // count is no proxy — AQE legitimately coalesces toy inputs.)
      val execDf = AsofJoinPlan.asof(left, right, "ts", Nil, Seq("v"),
        direction = dir)
      val plan = execDf.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), plan.take(3000))
      assert(plan.contains("Exchange hashpartitioning(__pid"),
        s"keyless asof ($dir) not bucket-clustered:\n${plan.take(3000)}")
    }
    // tolerance carries through the bucketed path
    val execTol = AsofJoinPlan.asof(left, right, "ts", Nil, Seq("v"),
      allowExact = false, toleranceMicros = Some(60L * 1000000))
      .select(col("event_id"), col("v"))
    val winTol = AsofOps.asof(left, right, "ts", Nil, Seq("v"),
      direction = "backward", allowExact = false,
      toleranceMicros = Some(60L * 1000000))
      .select(col("event_id"), col("v"))
    assertFrameEqual(execTol, winTol)
  }

  test("plan shape: one clustered exchange per side, no extra operators") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.select("user_id", "ts", "event_id")
    val right = ev.select(col("user_id"), col("ts"), col("value").as("v"))
    val plan = AsofJoinPlan.asof(left, right, "ts", Seq("user_id"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin "), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }
}

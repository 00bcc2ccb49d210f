package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** PageRank semantics the differential gate can't see: symmetry,
  * hub dominance, layout invariance of the integer arithmetic. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("cycle: perfect symmetry — every node gets the identical rank") {
    val e = (0L until 5L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val r = GraphOps.pageRank(e, iters = 4).collect()
      .map(_.getLong(1)).distinct
    assert(r.length === 1, s"cycle ranks diverged: ${r.toSeq}")
  }

  test("star: the hub out-ranks every leaf") {
    // leaves 1..6 -> hub 0, hub -> leaf 1 (so the hub has out-degree)
    val e = ((1L to 6L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ranks = GraphOps.pageRank(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    (2L to 6L).foreach(l => assert(hub > ranks(l), s"leaf $l >= hub"))
  }

  test("integer ranks are layout-invariant") {
    val e = (0L until 200L)
      .map(i => (i % 23, (i * 13 + 5) % 23)).toDF("src", "dst")
    val a = GraphOps.pageRank(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(e.repartition(17), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("checkpointEvery: deep iteration matches unchunked lineage and " +
    "bounds plan depth") {
    val e = (0L until 200L)
      .map(i => (i % 23, (i * 13 + 5) % 23)).toDF("src", "dst")
    val plain = GraphOps.pageRank(e, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ck = GraphOps.pageRank(e, iters = 8, checkpointEvery = 2)
    val got = ck.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === plain) // checkpointing must not change the math
    // round-8 plan depth stays bounded: the lineage behind the final
    // result contains only the joins SINCE the last checkpoint (rounds
    // 7-8 → 2 rounds × 3 joins), not 8 rounds' worth (24)
    val joins = ck.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.length
    assert(joins <= 6, s"checkpointed plan still nests $joins joins")
  }

  test("reliable checkpointing without a checkpoint dir fails loudly " +
    "up front, not after rounds of join work") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, iters = 4, checkpointEvery = 2, reliable = true)
    }
  }

  test("guards: empty edges and bad damping fail loudly") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException] { GraphOps.pageRank(empty) }
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, dampingPct = 100)
    }
  }
}

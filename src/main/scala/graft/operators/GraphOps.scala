package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the host-level quality prior web-curation
  * pipelines rank domains with (Common Crawl publishes exactly this:
  * host-graph PageRank/harmonic-centrality ranks used to weight crawl
  * frontiers and corpus draws). The reference has no graph surface;
  * this is north-star pipeline surface beside UrlOps' blocklists and
  * domain caps.
  *
  * Integer-exact by construction: ranks live in fixed-point units of
  * `scale` total mass, every per-edge contribution is an integer `div`
  * (floor) and every combine is an integer SUM — order-insensitive, so
  * the distributed result is bit-identical on any partitioning AND
  * replayable in any engine with floor division (the libm-free
  * discipline DsirOps established for scoring). The float variant of
  * PageRank would differ at 1 ulp per partial-sum order.
  */
object GraphOps {

  /** `iters` rounds of damped PageRank over `edges(srcCol, dstCol)`.
    * Returns (node, rank) with rank in fixed-point `scale` units.
    *
    * Per round: one join edges→ranks (key-clustered on src), one
    * map-side-combinable integer sum keyed by dst, one left join back
    * to the node set — all shuffles on graph keys, nothing driver-side
    * except the node COUNT (one scalar). Dangling mass decays (the
    * simplified variant; rank ORDER, which is what a curation prior
    * consumes, is unaffected). Multi-edges contribute once each —
    * pre-aggregate upstream if link multiplicity shouldn't weight.
    *
    * Plans chain across rounds (round k's plan contains k joins) —
    * fine for the 2-4 rounds a quality prior needs; for deeper runs
    * set `checkpointEvery` > 0 to truncate rank lineage every
    * that-many rounds (eager localCheckpoint; `reliable` = true uses
    * the fault-tolerant checkpoint(true) — needs a checkpoint dir —
    * trading speed for executor-loss recovery, the same dial
    * connectedComponents exposes for the same reason). */
  def pageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iters: Int = 3, dampingPct: Int = 85,
      scale: Long = 1000000000000L, checkpointEvery: Int = 0,
      reliable: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1: $iters")
    require(!reliable || checkpointEvery > 0,
      "reliable checkpointing needs checkpointEvery > 0")
    if (reliable)
      require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable = true requires sparkContext.setCheckpointDir on " +
          "shared storage (HDFS/object store) reachable from every " +
          "executor — failing HERE, not after checkpointEvery rounds " +
          "of join work (the connectedComponents guard)")
    require(dampingPct > 0 && dampingPct < 100,
      s"pageRank: dampingPct must be in (0, 100): $dampingPct")
    val src = col(srcCol); val dst = col(dstCol)
    val nodes = edges.select(src.as("node"))
      .union(edges.select(dst.as("node"))).distinct()
    val n = nodes.count() // one scalar: the host count
    require(n > 0, "pageRank: empty edge set")
    val base = scale / n
    val deg = edges.groupBy(src.as("__src")).agg(count(lit(1)).as("__deg"))
    var ranks = nodes.withColumn("rank", lit(base))
    for (i <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", srcCol), srcCol)
        .join(deg, col(srcCol) === col("__src"))
        .select(dst.as("node"), expr("rank div __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      // driver-side constant: Scala / on positive longs == floor div,
      // so the oracle's ((100-d) * base) // 100 states the same value.
      // Column-side `/` would return DOUBLE (Spark long division) —
      // keep everything in `div`.
      val teleport = (100L - dampingPct) * base / 100
      val step = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(__s, 0L)) div 100"))
            .as("rank"))
      ranks =
        if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
          (if (reliable) step.checkpoint(true)
           else step.localCheckpoint(true))
        else step
    }
    ranks
  }
}

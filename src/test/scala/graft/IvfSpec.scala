package graft

import graft.llm.SimilarityOps
import org.apache.spark.sql.functions._

/** IVF similarity tier: coarse k-means quantizer trained as DataFrame
  * aggregations, cell-restricted search. */
class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("IVF probes fewer candidates and stays deterministic") {
    val cents = SimilarityOps.trainIvfCentroids(emb, "vec_id", "embedding", 8)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    val a = SimilarityOps.ivfTopK(queries, emb, 3, cents, nprobe = 3).collect()
    val b = SimilarityOps.ivfTopK(queries, emb, 3, cents, nprobe = 3).collect()
    assert(a.toSeq == b.toSeq, "nondeterministic IVF results")
    assert(a.length == 30) // 10 queries × top-3
  }

  test("recall vs brute force improves with nprobe") {
    val cents = SimilarityOps.trainIvfCentroids(emb, "vec_id", "embedding", 8)
    val brute = SimilarityOps.bruteForceTopK(queries, emb, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(np: Int): Double = {
      val got = SimilarityOps.ivfTopK(queries, emb, 3, cents, np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val r2 = recall(2); val r8 = recall(8)
    assert(r8 == 1.0, s"nprobe=all must equal brute force, got $r8")
    assert(r2 > 0.2 && r2 <= r8, s"recall@nprobe2=$r2, @8=$r8")
  }

  test("persisted index: ivfTopKIndexed equals the in-memory tier at " +
      "nprobe<cells and prunes to probed cell partitions") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ivfidx-${ProcessHandle.current().pid()}").toString
    val cents = SimilarityOps.trainIvfCentroids(emb, "vec_id", "embedding", 8)
    SimilarityOps.writeIvfIndex(emb, dir, cents)
    // round-tripped coarse layer is bit-identical
    val back = SimilarityOps.readIvfCentroids(spark, dir)
    assert(back.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    for (np <- Seq(2, 8)) {
      val mem = SimilarityOps.ivfTopK(queries, emb, 3, cents, np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).sortBy(t => (t._1, t._4))
      val idx = SimilarityOps.ivfTopKIndexed(queries, dir, 3, np)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).sortBy(t => (t._1, t._4))
      assert(idx.toSeq === mem.toSeq, s"nprobe=$np diverged from memory tier")
    }
    // partition pruning: the cells scan carries a PartitionFilters
    // entry on the cell id (the on-disk analog of the cell join)
    val plan = SimilarityOps.ivfTopKIndexed(queries, dir, 3, 2)
      .queryExecution.executedPlan.toString
    // several scans carry a PartitionFilters entry (the query-side
    // parquet scan has an empty one) — the CELLS scan is the one whose
    // filter list actually names the cell partition column
    val pfs = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .toSeq
    assert(pfs.exists(l => l.contains("cell#") &&
        !l.contains("PartitionFilters: []")),
      s"no scan prunes on cell:\n${pfs.mkString("\n")}")
  }

  test("mmrTopK diversifies across clusters where plain top-k returns " +
      "near-duplicates") {
    import spark.implicits._
    // two tight clusters in 3-d; query points at cluster A
    val rows = Seq(
      (1L, Seq(1.00f, 0.01f, 0.0f)), (2L, Seq(1.00f, 0.02f, 0.0f)),
      (3L, Seq(0.99f, 0.03f, 0.0f)),                       // cluster A
      (10L, Seq(0.0f, 0.01f, 1.00f)), (11L, Seq(0.0f, 0.02f, 0.99f))
    ).toDF("vec_id", "embedding")
    val q = Array(1.0, 0.0, 0.0)
    val brute = SimilarityOps.bruteForceTopK(
      Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("q_id", "q_emb"), rows, 2)
      .collect().map(_.getLong(1)).toSet
    assert(brute.subsetOf(Set(1L, 2L, 3L)), s"brute picked $brute")
    val mmr = SimilarityOps.mmrTopK(rows, q, 2, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(Set(1L, 2L, 3L).contains(mmr(0)), s"rank 1 not relevant: ${mmr(0)}")
    assert(Set(10L, 11L).contains(mmr(1)),
      s"rank 2 should cross clusters, got ${mmr(1)}")
    // deterministic under relayout
    val again = SimilarityOps.mmrTopK(rows.repartition(5), q, 2, 0.5)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(again.toSeq === mmr.toSeq)
  }

  test("quantizedTopK: corpus-covering shortlist equals brute force " +
      "bit-exactly; small shortlists trade recall, scores stay exact") {
    val brute = SimilarityOps.bruteForceTopK(queries, emb, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    // shortlist ≥ corpus ⇒ re-rank sees everything ⇒ identical rows,
    // identical DOUBLES (the emitted score is exact cosine, not the
    // code approximation)
    val full = SimilarityOps.quantizedTopK(queries, emb, 3,
        rerankFactor = 400)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(full.toSeq == brute.toSeq)
    // tight shortlist: recall may drop, but every emitted (pair, score)
    // must carry the EXACT cosine of that pair (approximation selects,
    // never scores)
    val bruteAll = brute.map(t => (t._1, t._2) -> t._3).toMap
    val tight = SimilarityOps.quantizedTopK(queries, emb, 3,
        rerankFactor = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hit = tight.count(t => bruteAll.contains((t._1, t._2)))
    assert(hit.toDouble / tight.length > 0.5,
      s"int8 shortlist recall collapsed: $hit/${tight.length}")
    tight.filter(t => bruteAll.contains((t._1, t._2))).foreach { t =>
      assert(t._3 == bruteAll((t._1, t._2)), s"score drift on $t")
    }
  }

  test("k=256: seeding/assignment/probe plans stay O(1)-size in k") {
    // the former literal encoding (isInCollection + k-ary greatest /
    // when-fold) put O(k·dim) literals in the plan: 256 centroids × 64
    // dims ≈ 16k doubles ≈ >300k plan chars and codegen fell back. The
    // broadcast centroid frame keeps the plan a fixed HOF chain.
    val cents = SimilarityOps.seedCentroidsMaximin(emb, "vec_id", "embedding", 256)
    assert(cents.length == 256)
    assert(cents.map(_.toSeq).distinct.length == 256, "duplicate seeds")
    val assigned = SimilarityOps.assignCells(emb, "embedding", cents)
    val planLen = assigned.queryExecution.executedPlan.toString.length
    assert(planLen < 20000, s"assign plan blew up: $planLen chars")
    assert(assigned.select("__cell").distinct().count() > 32, "degenerate cells")
    val top = SimilarityOps.ivfTopK(queries, emb, 3, cents, nprobe = 64)
    assert(top.queryExecution.executedPlan.toString.length < 40000,
      "probe plan blew up")
    assert(top.collect().length == 30)
  }

  test("clusterBalancedSample: planted one-hot clusters assign exactly, " +
      "hot cluster caps at perCluster, layout-invariant") {
    import spark.implicits._
    // 3 orthogonal directions; cluster 0 is HOT (60 rows), 1 and 2
    // hold 10 and 3 — the cap trims the two over-capacity clusters
    // (0 and 1) to 8 and leaves under-capacity cluster 2 whole
    def vec(axis: Int, mag: Double): Seq[Double] =
      (0 until 8).map(i => if (i == axis) mag else 0.0)
    val rows = ((0L until 60L).map(i => (i, vec(0, 1.0 + (i % 5) * 0.1))) ++
      (60L until 70L).map(i => (i, vec(1, 2.0))) ++
      (70L until 73L).map(i => (i, vec(2, 3.0)))).toDF("vec_id", "embedding")
    val cents = Array(vec(0, 1.0).toArray, vec(1, 1.0).toArray,
      vec(2, 1.0).toArray)
    val out = SimilarityOps.clusterBalancedSample(rows, "vec_id",
      "embedding", cents, 8)
    val byCluster = out.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCluster == Map(0 -> 8L, 1 -> 8L, 2 -> 3L), byCluster.toString)
    // every kept row sits in its true cluster
    val wrong = out.filter(
      (col("vec_id") < 60 && col("cluster") =!= 0) ||
      (col("vec_id") >= 60 && col("vec_id") < 70 && col("cluster") =!= 1) ||
      (col("vec_id") >= 70 && col("cluster") =!= 2)).count()
    assert(wrong == 0)
    val again = SimilarityOps.clusterBalancedSample(rows.repartition(7),
      "vec_id", "embedding", cents, 8)
      .select("vec_id").as[Long].collect().toSet
    assert(again == out.select("vec_id").as[Long].collect().toSet)
  }
}

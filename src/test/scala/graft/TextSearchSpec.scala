package graft

import graft.llm.TextSearchOps
import org.apache.spark.sql.functions._

/** Functional coverage for the lexical-retrieval operators on
  * hand-computable fixtures (the oracle gates bm25_topk /
  * tfidf_top_terms / boilerplate_lines pin the DuckDB-differential
  * side; these pin semantics a fixture makes obvious).
  */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark query engine"),
    (2L, "spark spark spark"),
    (3L, "join order merge"),
    (4L, "the quick brown fox")
  ).toDF("doc_id", "text")

  test("bm25: term-saturating, matching docs only, ties by id") {
    val r = TextSearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("spark"), k = 10).collect()
    // only docs 1 and 2 match; doc 2 has higher tf hence higher score
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(r(0).getDouble(1) > r(1).getDouble(1))
    // tf saturation: tripling tf must NOT triple the score (k1 bound)
    assert(r(0).getDouble(1) < 3 * r(1).getDouble(1))
  }

  test("bm25: k truncates after the deterministic ordering") {
    val r = TextSearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "merge"), k = 1).collect()
    assert(r.length == 1)
  }

  test("tfidf: corpus-unique terms outrank corpus-common ones") {
    val r = TextSearchOps.tfIdfTopTerms(corpus, "doc_id", "text", n = 2)
      .filter(col("doc_id") === 1L).orderBy("rn").collect()
    // "spark" appears in 2 of 4 docs; "query"/"engine" in 1 of 4 —
    // the unique terms must rank above the shared one for doc 1
    val top = r.map(_.getString(1)).toSeq
    assert(top == Seq("engine", "query"), top.toString)
  }

  test("tfidf: a term present in every document scores exactly zero") {
    val docs = Seq((1L, "common a"), (2L, "common b")).toDF("doc_id", "text")
    val r = TextSearchOps.tfIdfTopTerms(docs, "doc_id", "text", n = 5)
      .filter(col("term") === "common").collect()
    assert(r.nonEmpty && r.forall(_.getDouble(2) == 0.0))
  }

  test("tfidf: over-threshold vocabulary falls back from broadcast to a " +
      "shuffle join and still answers identically") {
    val hinted = TextSearchOps.tfIdfTopTerms(corpus, "doc_id", "text", n = 2)
    // threshold of 1 term forces the fallback for any real vocabulary
    val guarded = TextSearchOps.tfIdfTopTerms(corpus, "doc_id", "text",
      n = 2, maxBroadcastTerms = 1L)
    assertFrameEqual(guarded, hinted)
    // plan assertion, run with auto-broadcast disabled: a FORCED
    // broadcast() hint ignores the threshold and would still broadcast;
    // the fallback path has no hint, so the df join must go shuffle-side
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val cold = TextSearchOps.tfIdfTopTerms(corpus, "doc_id", "text",
        n = 2, maxBroadcastTerms = 1L)
      cold.collect()
      val plan = cold.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(2000))
    } finally spark.conf.set(key, old)
  }

  test("boilerplate: frequent lines vanish, order survives, all-boiler " +
      "docs drop out") {
    val docs = Seq(
      (1L, "keep one\nFOOTER\nkeep two"),
      (2L, "FOOTER\nother text"),
      (3L, "FOOTER")
    ).toDF("doc_id", "text")
    val r = TextSearchOps.removeBoilerplateLines(docs, "doc_id", "text",
      "\n", minDocs = 3).collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "keep one\nkeep two", 2L -> "other text"),
      r.toString)  // doc 3 was pure boilerplate → gone
  }

  test("boilerplate: below-threshold duplicate lines are kept") {
    val docs = Seq(
      (1L, "dup\na"),
      (2L, "dup\nb")
    ).toDF("doc_id", "text")
    val r = TextSearchOps.removeBoilerplateLines(docs, "doc_id", "text",
      "\n", minDocs = 3).collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "dup\na", 2L -> "dup\nb"), r.toString)
  }

  // --- property tests: random corpora vs exact driver-side references
  // (FIXTURES.md §B style: fixed-seed ScalaCheck gens, no bridge).
  // The references mirror the operators' IEEE operation ORDER, and the
  // corpus stats are integral-valued doubles (exact under any partial-
  // aggregation order), so every comparison is bit-exact — including
  // through Math.log, which is the same JVM intrinsic on both sides.

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 15).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1, 12).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf(vocab)).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  private def corpora(seedBase: Long, n: Int = 6): Seq[List[(Long, String)]] =
    (0 until n).map(i =>
      corpusGen.pureApply(Gen.Parameters.default, Seed(seedBase + i)))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("property: bm25TopK equals the reference formula on random corpora") {
    val terms = Seq("alpha", "gamma")
    val (k1, b) = (1.2, 0.75)
    corpora(600L).foreach { docs =>
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val n = toks.size.toDouble
      val avgdl = toks.map(_._2.size.toDouble).sum / n
      val dfs = terms.map(t => toks.count(_._2.contains(t)).toDouble)
      val expected = toks.flatMap { case (id, w) =>
        val dl = w.size.toDouble
        val score = terms.zip(dfs).map { case (t, df) =>
          val tf = w.count(_ == t).toDouble
          val idf = math.log(1d + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * dl / avgdl))
        }.reduce(_ + _)
        if (w.exists(terms.contains)) Some(id -> round6(score)) else None
      }.sortBy { case (id, s) => (-s, id) }.take(4)
      val got = TextSearchOps.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", terms, 4, k1, b)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(got == expected, s"\ndocs=$docs\n got=$got\n exp=$expected")
    }
  }

  test("property: tfIdfTopTerms equals the reference formula on random " +
      "corpora") {
    corpora(700L).foreach { docs =>
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val n = toks.size.toDouble
      val df = toks.flatMap(_._2.distinct).groupBy(identity).view
        .mapValues(_.size.toDouble).toMap
      val expected = toks.flatMap { case (id, w) =>
        val dl = w.size.toDouble
        w.distinct.map { t =>
          (id, t, round6(w.count(_ == t).toDouble / dl * math.log(n / df(t))))
        }.sortBy { case (_, t, s) => (-s, t) }.take(2).zipWithIndex
          .map { case ((i, t, s), r) => (i, t, s, r + 1) }
      }.toSet
      val got = TextSearchOps.tfIdfTopTerms(docs.toDF("doc_id", "text"),
        "doc_id", "text", 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(got == expected, s"\ndocs=$docs\n got=$got\n exp=$expected")
    }
  }

  test("property: removeBoilerplateLines equals the reference filter on " +
      "random line corpora") {
    val lineVocab = Vector("nav bar", "footer", "content a", "content b",
      "content c", "subscribe")
    val linesGen: Gen[List[(Long, String)]] =
      Gen.chooseNum(2, 10).flatMap { n =>
        Gen.listOfN(n, Gen.chooseNum(1, 5).flatMap(m =>
          Gen.listOfN(m, Gen.oneOf(lineVocab)).map(_.mkString("\n"))))
          .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      }
    (0 until 6).foreach { i =>
      val docs = linesGen.pureApply(Gen.Parameters.default, Seed(800L + i))
      val minDocs = 2 + (i % 2)
      val split = docs.map { case (id, t) => id -> t.split("\n").toSeq }
      val frequent = split.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.size >= minDocs).keySet
      val expected = split.flatMap { case (id, ls) =>
        val kept = ls.filterNot(frequent)
        if (kept.nonEmpty) Some(id -> kept.mkString("\n")) else None
      }.toMap
      val got = TextSearchOps.removeBoilerplateLines(docs.toDF("doc_id", "text"),
        "doc_id", "text", "\n", minDocs)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected,
        s"\nminDocs=$minDocs docs=$docs\n got=$got\n exp=$expected")
    }
  }
}

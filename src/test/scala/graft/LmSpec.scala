package graft

import graft.llm.LmOps
import org.apache.spark.sql.functions._

/** Bigram-LM scoring (LmOps): the integer overlap core on a planted
  * corpus, and the log-space perplexity against a driver-replayed
  * reference (both sides JVM ⇒ bit-comparable at tolerance). */
class LmSpec extends SparkSpec {
  import spark.implicits._

  // Reference corpus: two docs establishing "the cat sat", "the dog sat".
  private val ref = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the mat")).toDF("id", "text")

  // Candidates: in-distribution, half-attested, out-of-distribution,
  // single-word (no bigram evidence), empty.
  private val docs = Seq(
    (10L, "the cat sat on the mat"),
    (11L, "the cat ate fish today"),
    (12L, "quantum flux torsion manifold"),
    (13L, "hello"),
    (14L, "")).toDF("id", "text")

  test("lmOverlapScore: counts, hit mass, and the 50% keep rule") {
    val out = LmOps.lmOverlapScore(docs, ref, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // ref bigram counts: "the cat"1 "cat sat"1 "the dog"1 "dog sat"1
    //   "sat on"2 "on the"2 "the mat"2
    assert(out(0) == ((10L, 5L, 5L, 8L, true)))   // all attested
    assert(out(1) == ((11L, 4L, 1L, 1L, false)))  // only "the cat"
    assert(out(2) == ((12L, 3L, 0L, 0L, false)))  // nothing attested
    assert(out(3) == ((13L, 0L, 0L, 0L, true)))   // no evidence ⇒ keep
    assert(out(4) == ((14L, 0L, 0L, 0L, true)))
  }

  test("lmPerplexity: add-one-smoothed bigram logprob matches a driver replay") {
    val out = LmOps.lmPerplexity(docs, ref, "id", "text")
      .orderBy("id").collect()
    // driver replay: V = |{the,cat,sat,on,mat,dog}| = 6; unigrams:
    // the:4 cat:1 dog:1 sat:2 on:2 mat:2
    val big = Map("the cat" -> 1L, "cat sat" -> 1L, "the dog" -> 1L,
      "dog sat" -> 1L, "sat on" -> 2L, "on the" -> 2L, "the mat" -> 2L)
    val uni = Map("the" -> 4L, "cat" -> 1L, "dog" -> 1L, "sat" -> 2L,
      "on" -> 2L, "mat" -> 2L)
    def replay(text: String): Option[Double] = {
      val w = text.split("\\s+").filter(_.nonEmpty)
      if (w.length < 2) None
      else Some(w.sliding(2).map { p =>
        math.log((big.getOrElse(p.mkString(" "), 0L) + 1).toDouble /
          (uni.getOrElse(p(0), 0L) + 6).toDouble)
      }.sum / (w.length - 1))
    }
    for ((r, text) <- out.zip(Seq("the cat sat on the mat",
        "the cat ate fish today", "quantum flux torsion manifold",
        "hello", ""))) {
      replay(text) match {
        case Some(exp) =>
          val got = r.getDouble(r.fieldIndex("avg_logprob"))
          assert(math.abs(got - exp) < 1e-12, s"id=${r.getLong(0)}: $got vs $exp")
          assert(math.abs(r.getDouble(r.fieldIndex("perplexity")) -
            math.exp(-exp)) < 1e-9)
        case None =>
          assert(r.isNullAt(r.fieldIndex("avg_logprob")),
            s"id=${r.getLong(0)} should have NULL avg_logprob")
      }
    }
    // ranking: in-distribution < half-attested < out-of-distribution
    val ppl = out.take(3).map(_.getDouble(2))
    assert(ppl(0) < ppl(1) && ppl(1) < ppl(2), ppl.toSeq.toString)
  }

  test("backoffMatchLevels: longest-match cascade on a hand-checked corpus") {
    // ref trigrams: {the cat sat, cat sat on, sat on the, on the mat,
    //   the dog sat, dog sat on}; bigrams: {the cat, cat sat, sat on,
    //   on the, the mat, the dog, dog sat}; unigrams: {the,cat,sat,on,
    //   mat,dog}
    val docs = Seq(
      (30L, "the cat sat on the mat"),   // all 4 positions trigram-hit
      (31L, "big dog sat on a mat"),     // one of each level
      (32L, "zz yy xx"),                 // single all-OOV position
      (33L, "too short")                 // <3 words ⇒ zeros
    ).toDF("id", "text")
    val out = LmOps.backoffMatchLevels(docs, ref, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out(0) == ((30L, 4L, 4L, 0L, 0L, 0L)))
    // big dog sat→bg "dog sat"=2; dog sat on→tri=3; sat on a→oov=0
    // (bg "on a", ug "a" unattested); on a mat→ug "mat"=1
    assert(out(1) == ((31L, 4L, 1L, 1L, 1L, 1L)))
    assert(out(2) == ((32L, 1L, 0L, 0L, 0L, 1L)))
    assert(out(3) == ((33L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("null text scores as no-evidence (0,0,0,keep) on both paths") {
    val withNull = Seq((20L, null.asInstanceOf[String]), (21L, "the cat sat"))
      .toDF("id", "text")
    val o = LmOps.lmOverlapScore(withNull, ref, "id", "text")
      .filter($"id" === 20L).collect()
    assert(o.length == 1)
    assert(o(0).getLong(1) == 0L && o(0).getLong(3) == 0L && o(0).getBoolean(4))
    val p = LmOps.lmPerplexity(withNull, ref, "id", "text")
      .filter($"id" === 20L).collect()
    assert(p.length == 1 && p(0).isNullAt(p(0).fieldIndex("avg_logprob")))
    val b = LmOps.backoffMatchLevels(withNull, ref, "id", "text")
      .filter($"id" === 20L).collect()
    assert(b.length == 1 && (1 to 5).forall(i => b(0).getLong(i) == 0L),
      b.mkString(","))
  }

  test("lmOverlapScore on the sf0.001 documents table is total and keyed once per doc") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val ref = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val out = LmOps.lmOverlapScore(docs, ref, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.filter(col("n_bigrams") < col("hit_bigrams")).count() == 0)
    // the reference slice itself is fully attested ⇒ keep = true
    assert(out.join(ref.select("doc_id"), "doc_id")
      .filter(!col("keep")).count() == 0)
  }
}

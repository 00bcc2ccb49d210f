package graft

import graft.llm.TextStatsOps
import org.apache.spark.sql.functions._

/** Viterbi unigram segmentation: hand-computed optima, tie-breaks,
  * the maxTokenLen reachability bound, and fallback arms. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // micro log-probs (negative; higher = likelier)
  private val vocab = Map(
    "the" -> -1000000L, "theory" -> -1500000L, "ory" -> -1200000L,
    "matic" -> -1100000L, "cat" -> -900000L, "s" -> -800000L,
    "ab" -> -2000000L, "a" -> -1000000L, "b" -> -1000000L,
    "abcdefghij" -> -100000L)
  private val Unk = -10000000L

  private def count(w: String): Int =
    Seq(w).toDF("w")
      .select(TextStatsOps.unigramTokenCount(col("w"), vocab, Unk).as("n"))
      .collect()(0).getInt(0)

  test("whole-word beats decomposition when likelier") {
    // theory: -1.5e6 (1 tok) vs the+ory: -2.2e6 (2 tok)
    assert(count("theory") === 1)
  }

  test("composition beats char fallback") {
    // thematic: the+matic = -2.1e6 (2) vs the+5 chars = -51e6; chars -80e6
    assert(count("thematic") === 2)
    // cats: cat+s = -1.7e6
    assert(count("cats") === 2)
    // theorys: theory+s = -2.3e6 vs the+ory+s = -3.0e6
    assert(count("theorys") === 2)
  }

  test("OOV words fall back to one token per char") {
    assert(count("dog") === 3)
  }

  test("equal-score tie resolves to fewer tokens") {
    // ab: whole = -2e6 (1 tok) vs a+b = -2e6 (2 toks)
    assert(count("ab") === 1)
  }

  test("vocab entries beyond maxTokenLen are unreachable") {
    // "abcdefghij" scores -0.1e6 as a whole token, but with the
    // default bound 8 the 10-char window is never formed: the DP must
    // stitch from "ab"/"a"/"b" + unk chars instead
    assert(count("abcdefghij") > 1)
    val wide = Seq("abcdefghij").toDF("w")
      .select(TextStatsOps.unigramTokenCount(col("w"), vocab, Unk,
        maxTokenLen = 10).as("n")).collect()(0).getInt(0)
    assert(wide === 1)
  }

  test("doc-level count sums words; null and empty count 0") {
    val df = Seq(("theory cats dog", 1L), (null.asInstanceOf[String], 2L),
      ("", 3L)).toDF("t", "id")
    val got = df.select(col("id"),
      TextStatsOps.unigramTokenCountDoc(col("t"), vocab, Unk).as("n"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got(1L) === 6L) // 1 + 2 + 3
    assert(got(2L) === 0L) // null text counts 0, never NULL
    assert(got(3L) === 0L)
  }
}

package graft

import graft.llm.TextDedupOps
import org.apache.spark.sql.functions._

/** fuzzyPairs: typo recall, the blocking cap's pair-bound, and edge
  * arms (nulls, short strings, maxDist=0). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("finds typo pairs, skips distant strings, reports distance") {
    val df = Seq(
      (1L, "parquet layout"), (2L, "parqeut layout"), // transposition: dist 2
      (3L, "parquet layoutx"),                        // insert: dist 1 vs 1
      (4L, "completely different"),
      (5L, null.asInstanceOf[String]), (6L, "ab")     // null + shorter than n
    ).toDF("id", "s")
    val got = TextDedupOps.fuzzyPairs(df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // (2,3) is distance 3 (transposition = 2 subs, plus the insert)
    // and must be excluded at maxDist = 2
    assert(got === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L))
  }

  test("a pair whose ONLY shared grams are hot is not proposed under " +
    "the cap (the standard blocking trade), and is found without it") {
    // the target pair is distance 1 but shares only the ubiquitous
    // gram 'aaa', which 20 filler strings also carry (df = 22 > 10)
    val rows = (Seq((0L, "aaaaaaab"), (1L, "aaaaaaac")) ++
      (10L until 30L).map { i =>
        val c1 = ('b' + (i - 10).toInt).toChar
        val c2 = ('b' + ((i * 3) % 17).toInt).toChar
        (i, s"aaa${c1}${c2}q$i")
      }).toDF("id", "s")
    val capped = TextDedupOps.fuzzyPairs(rows, "id", "s",
      maxDist = 1, n = 3, maxGramDocs = 10).collect()
    assert(!capped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "hot-gram-only pair proposed despite the cap")
    val uncapped = TextDedupOps.fuzzyPairs(rows, "id", "s",
      maxDist = 1, n = 3).collect()
    assert(uncapped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "uncapped blocking missed the typo pair")
  }

  test("maxDist = 0 returns only exact duplicates") {
    val df = Seq((1L, "same title"), (2L, "same title"),
      (3L, "same titles")).toDF("id", "s")
    val got = TextDedupOps.fuzzyPairs(df, "id", "s", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}

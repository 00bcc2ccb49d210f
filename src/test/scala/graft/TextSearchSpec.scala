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
}

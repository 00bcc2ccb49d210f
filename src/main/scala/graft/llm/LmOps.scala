package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for training-data curation — the
  * CCNet/FineWeb "perplexity filter" tier (Wenzek et al. 2020 "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"
  * trains a KenLM 5-gram on Wikipedia and keeps the low-perplexity
  * head; the reference fork has no LM surface — its nearest primitive
  * is value_counts, pandas/core/algorithms.py:817).
  *
  * This is the distributed bigram instance of that design: train count
  * tables from a REFERENCE corpus (one map-side-combined aggregation
  * per n-gram order), then score every candidate document by joining
  * its bigram stream against the counts.
  *
  * Scale shape (100 TB candidates, curated reference):
  *   - training is two hash aggregations (bigram, unigram) — partial
  *     aggregation collapses hot n-grams ("of the") map-side, so the
  *     shuffle carries ≤ |vocab²∩corpus| rows, not the token stream;
  *   - scoring explodes candidate bigrams once and shuffle-joins on the
  *     bigram key. The count side is pre-aggregated (exactly one row
  *     per bigram), so a hot bigram is join-side skew AQE splits —
  *     never a window, never a driver collect;
  *   - the per-document rollup is one more keyed aggregation.
  * When the reference vocabulary is small (the usual case — curated
  * wiki-scale text vs web-scale candidates), Catalyst broadcasts the
  * count side and the scoring path costs ZERO extra shuffles beyond
  * the per-doc rollup.
  */
object LmOps {

  /** Adjacent-word bigrams as "w1 w2" strings (words contain no
    * whitespace by construction of [[TextStatsOps.words]], so the
    * space-join is injective). Caller must guarantee size ≥ 2;
    * [[explodedBigrams]] filters first. */
  def bigrams(words: Column): Column =
    zip_with(slice(words, lit(1), size(words) - 1),
      slice(words, lit(2), size(words) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** (idCol, bg) — one row per bigram OCCURRENCE. The word array is
    * staged as a real column before the HOF slices so the tokenizer
    * runs once per row, not once per element. */
  def explodedBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextStatsOps.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(bigrams(col("__w"))).as("bg"))

  /** Train: bigram → occurrence count over the reference corpus. */
  def bigramCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    explodedBigrams(ref, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("__c"))

  /** Train: word → occurrence count over the reference corpus. */
  def unigramCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    ref.select(explode(TextStatsOps.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__cw"))

  /** INTEGER-EXACT reference-overlap score per document — the
    * engine-portable core of the perplexity filter (log-free, so the
    * differential gate hash-compares exactly; [[lmPerplexity]] layers
    * the real log-space score on top for in-engine use):
    *   n_bigrams   — bigram occurrences in the document,
    *   hit_bigrams — occurrences whose bigram exists in the reference,
    *   hit_mass    — Σ reference-count over those occurrences,
    *   keep        — hit_bigrams·2 ≥ n_bigrams (≥50% of the document's
    *                 adjacent word pairs attested in the reference —
    *                 the integer cross-multiplied form of the CCNet
    *                 head/tail split).
    * Documents with <2 words score (0, 0, 0, keep=true): an empty
    * document carries no evidence AGAINST the reference model; length
    * floors are the Gopher gate's job, not the LM's. */
  def lmOverlapScore(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val counts = bigramCounts(ref, idCol, textCol)
    val perDoc = explodedBigrams(docs, idCol, textCol)
      .join(counts, Seq("bg"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("__c")).as("hit_bigrams"),
        coalesce(sum(col("__c")), lit(0L)).as("hit_mass"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("hit_bigrams"), lit(0L)).as("hit_bigrams"),
        coalesce(col("hit_mass"), lit(0L)).as("hit_mass"))
      .withColumn("keep", col("hit_bigrams") * 2 >= col("n_bigrams"))
  }

  /** Trigram ending at 1-based position `i` of word array `w` — the
    * ONE builder both the count-table training and the scoring
    * position stream use: training and probing must stay bit-identical
    * or every probe becomes a non-match with no compile-time signal. */
  private def triAt(w: Column, i: Column): Column =
    concat_ws(" ", element_at(w, i - 2), element_at(w, i - 1),
      element_at(w, i))

  /** Bigram ending at 1-based position `i` (same sharing rationale). */
  private def biAt(w: Column, i: Column): Column =
    concat_ws(" ", element_at(w, i - 1), element_at(w, i))

  /** Train: trigram → occurrence count over the reference corpus. */
  def trigramCounts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    ref.select(TextStatsOps.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(explode(transform(sequence(lit(3), size(col("__w"))),
        i => triAt(col("__w"), i))).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("__c3"))

  /** Stupid-backoff longest-match profile (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the n-gram model that
    * actually scales to web corpora because it needs only counts, no
    * discounting): for every trigram position of a document, the
    * longest reference-attested suffix level — 3 (trigram match), 2
    * (bigram), 1 (unigram), 0 (OOV) — aggregated per document. The
    * level histogram is the integer-exact core of the backoff score
    * (which weights the levels 1, 0.4, 0.16): it drives head/tail
    * splits and OOV filters without a single float, so the
    * differential gate hash-compares exactly.
    *
    * Scale shape: three count-table trainings (map-side-combined
    * aggregations over the reference) and three key joins of the
    * candidate position stream (trigram, bigram, unigram) — each build
    * side is pre-aggregated to one row per n-gram and broadcastable
    * for a curated reference; probe-side hot keys are AQE-splittable
    * join skew. One per-doc rollup shuffle. Positions start at the
    * third word (full trigram context only), matching the oracle. */
  def backoffMatchLevels(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tri = trigramCounts(ref, idCol, textCol)
    val big = bigramCounts(ref, idCol, textCol)
    val uni = unigramCounts(ref, idCol, textCol)
    val pos = docs
      .select(col(idCol), TextStatsOps.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col(idCol), explode(transform(sequence(lit(3), size(col("__w"))),
        i => struct(triAt(col("__w"), i).as("tg"),
          biAt(col("__w"), i).as("bg"),
          element_at(col("__w"), i).as("ug")))).as("__p"))
      .select(col(idCol), col("__p.tg").as("tg"), col("__p.bg").as("bg"),
        col("__p.ug").as("ug"))
    val flagged = pos
      .join(tri, Seq("tg"), "left")
      .join(big, Seq("bg"), "left")
      .join(uni, col("ug") === col("w"), "left")
    val level = when(col("__c3").isNotNull, 3)
      .when(col("__c").isNotNull, 2)
      .when(col("__cw").isNotNull, 1)
      .otherwise(0)
    val perDoc = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_pos"),
      sum(when(level === 3, 1L).otherwise(0L)).as("l3"),
      sum(when(level === 2, 1L).otherwise(0L)).as("l2"),
      sum(when(level === 1, 1L).otherwise(0L)).as("l1"),
      sum(when(level === 0, 1L).otherwise(0L)).as("oov"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("l3"), lit(0L)).as("l3"),
        coalesce(col("l2"), lit(0L)).as("l2"),
        coalesce(col("l1"), lit(0L)).as("l1"),
        coalesce(col("oov"), lit(0L)).as("oov"))
  }

  /** Real log-space bigram LM score with add-one smoothing:
    *   avg_logprob = (1/n) Σᵢ ln((C(wᵢ₋₁wᵢ)+1) / (C(wᵢ₋₁)+V)),
    *   perplexity  = exp(−avg_logprob),
    * V = reference vocabulary size. Lower perplexity ⇒ closer to the
    * reference distribution (the CCNet "head"). Doubles — for
    * in-engine filtering and ORDER BY; the cross-engine gate rides
    * [[lmOverlapScore]] instead (libm ln differs at 1 ULP between
    * engines, see the verify notes).
    *
    * Plan: the two count joins as above, plus the vocabulary size as a
    * one-row broadcast (the bm25_topk scalar shape). Documents with <2
    * words get NULL avg_logprob/perplexity (no bigram evidence). */
  def lmPerplexity(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg2 = bigramCounts(ref, idCol, textCol)
    val uni = unigramCounts(ref, idCol, textCol)
    val vocab = uni.agg(count(lit(1)).as("__v"))
    // carry w1 alongside the bigram from the zip (re-splitting the
    // just-concatenated "w1 w2" string per row would pay a redundant
    // regex and lean on a words-contain-no-space invariant)
    val scored = docs
      .select(col(idCol), TextStatsOps.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__w"), lit(1), size(col("__w")) - 1),
        slice(col("__w"), lit(2), size(col("__w")) - 1),
        (a, b) => struct(a.as("w1"),
          concat(a, lit(" "), b).as("bg")))).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.bg").as("bg"))
      .join(bg2, Seq("bg"), "left")
      .join(uni, col("w1") === col("w"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__cw"), lit(0L)) + col("__v")).cast("double"))
          .as("__lp"))
      .groupBy(col(idCol))
      .agg(avg(col("__lp")).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }
}

package graft.llm

// (chunking lives here with the other per-document scan-local ops)

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (north-star LLM pipeline):
  * token statistics, quality scoring, n-gram language ID. Pure codegen'd
  * column expressions — they run inside the scan's WholeStageCodegen,
  * no shuffle, no UDF.
  */
object TextStatsOps {

  def tokens(text: Column): Column = split(TextDedupOps.normalize(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio: vocabulary richness. */
  def distinctRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Mean token length (chars, separators excluded). */
  def avgTokenLen(text: Column): Column =
    (length(TextDedupOps.normalize(text)) - (tokenCount(text) - 1)).cast("double") /
      tokenCount(text)

  /** Fraction of characters outside [a-z0-9 space] (punctuation etc). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(lower(text), "[^a-z0-9 ]", "")))
      .cast("double") / length(text)

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text)

  val EN_STOPWORDS: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DE_STOPWORDS: Seq[String] = Seq("der", "die", "und", "das", "ist", "ein")

  /** Stopword-list language ID: argmax of per-language hit counts
    * (ties → English). The n-gram-profile refinement rides the same
    * shape: per-language score expressions + greatest(). */
  def langIdGuess(text: Column): Column = {
    val en = stopwordCount(text, EN_STOPWORDS)
    val de = stopwordCount(text, DE_STOPWORDS)
    when(en >= de, lit("en")).otherwise(lit("de"))
  }

  /** Composite quality score in [0,1]: vocabulary richness + length
    * saturation + token-shape saturation (pure IEEE arithmetic). */
  def qualityScore(text: Column, nChars: Column): Column =
    lit(0.5) * distinctRatio(text) +
      lit(0.3) * least(nChars.cast("double") / 500.0, lit(1.0)) +
      lit(0.2) * least(avgTokenLen(text) / 10.0, lit(1.0))

  /** BPE-ish sub-token count: whitespace tokens + an extra unit per 4
    * chars of long tokens (a cheap deterministic proxy for tokenizer
    * budget accounting). */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(ceil(length(t) / 4.0), lit(1L)))

  /** Raw whitespace words (no lowercasing/punct-stripping): the Gopher
    * rules are defined over surface words, unlike `tokens` which rides
    * the dedup normalizer. Empty fragments from leading/trailing/double
    * whitespace are dropped so word counts match a human count. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Gopher stop-word list (Rae et al. 2021 appendix A1.1: a document
    * must contain ≥2 of these to pass the stop-word rule). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-filter rules (Rae et al. 2021, appendix A1.1 —
    * the de-facto standard pretraining quality gate, also the base of
    * FineWeb/Dolma filter stacks). Each rule is its own boolean column
    * so downstream curation can audit WHICH rule dropped a document,
    * plus the conjunction as `keep`:
    *   - ok_words:        50 ≤ word count ≤ 100 000
    *   - ok_word_len:     3 ≤ mean word length ≤ 10
    *   - ok_symbol_ratio: (# of '#' + '...') / words < 0.1
    *   - ok_bullets:      < 90 % of lines start with a bullet
    *   - ok_ellipsis:     < 30 % of lines end with an ellipsis
    *   - ok_alpha:        ≥ 80 % of words contain an alphabetic char
    *   - ok_stopwords:    ≥ 2 hits from the 8-word Gopher stop list
    * All rules are row-local codegen'd expressions — zero shuffle; the
    * whole filter runs at scan throughput on 100 TB. Ratio comparisons
    * are int/int IEEE divisions, bit-identical across engines, so the
    * booleans face the DuckDB oracle directly (gopher_quality gate).
    * Returns (name, column) pairs ready to `.select` after the id. */
  def gopherQualityFlags(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val wc = size(ws)
    val meanLen = aggregate(ws, lit(0L), (a, t) => a + length(t))
      .cast("double") / wc
    // leftmost non-overlapping replace in both engines, so '....'
    // counts one ellipsis — same arithmetic on both sides of the gate
    val hashCount = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisCount =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val lines = split(text, "\n")
    val bulletFrac = size(filter(lines, l =>
      substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("double") /
      size(lines)
    val ellipsisFrac = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double") /
      size(lines)
    val alphaFrac = size(filter(ws, t => t.rlike("[A-Za-z]")))
      .cast("double") / wc
    val stopHits = size(filter(ws,
      t => lower(t).isin(GopherStopwords.map(lit): _*)))
    Seq(
      "word_count" -> wc.cast("long"),
      "ok_words" -> (wc >= 50 && wc <= 100000),
      "ok_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "ok_symbol_ratio" ->
        ((hashCount + ellipsisCount).cast("double") / wc < 0.1),
      "ok_bullets" -> (bulletFrac < 0.9),
      "ok_ellipsis" -> (ellipsisFrac < 0.3),
      "ok_alpha" -> (alphaFrac >= 0.8),
      "ok_stopwords" -> (stopHits >= 2))
  }

  /** Conjunction of every Gopher rule — the document survives the
    * quality gate. */
  def gopherKeep(text: Column): Column =
    gopherQualityFlags(text).collect {
      case (n, c) if n.startsWith("ok_") => c
    }.reduce(_ && _)

  /** Word n-gram shingles of a MATERIALIZED token-array column (HOF
    * re-evaluation rule: pass `tokens(text)` through a column first). */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** PII scrubbing for training corpora: redact emails and phone-shaped
    * digit runs (the two patterns every curation pipeline starts with).
    * Pure regexp_replace — codegen'd, scan-local; patterns deliberately
    * use only syntax common to Java regex and RE2 so the same strings
    * drive any engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}|[0-9]{3}[-. ][0-9]{4}"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Repetition ratio: 1 − distinct/total word n-grams — the standard
    * boilerplate/templating signal in training-data quality filters
    * (high ⇒ repeated phrases). Row-local, codegen'd, no shuffle. */
  def repetitionRatio(toks: Column, n: Int): Column = {
    val sh = shingles(toks, n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  /** Sliding word-window chunking — the curation step before embedding:
    * each document becomes ceil((words − overlap)/(max − overlap))
    * chunks of up to `maxWords` words, consecutive chunks sharing
    * `overlap` words. Pure flatMap shape (one posexplode over a
    * row-local sequence — no shuffle, no state): 100 TB of documents
    * chunk at scan throughput. Returns (idCol, chunk_id, chunk). */
  def chunkWords(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxWords: Int, overlap: Int)
      : org.apache.spark.sql.DataFrame = {
    require(maxWords > overlap && overlap >= 0,
      s"need maxWords > overlap >= 0: $maxWords, $overlap")
    val step = maxWords - overlap
    val words = tokens(col(textCol))
    // integer ceil-div via FP divide + truncating cast (operands are
    // small positive ints — exact in double)
    val n = greatest(lit(1),
      ((size(words) - lit(overlap) + lit(step - 1)) / lit(step)).cast("int"))
    df.select(col(idCol), posexplode(transform(sequence(lit(0), n - 1),
        k => array_join(slice(words, k * step + 1, lit(maxWords)), " "))))
      .select(col(idCol), col("pos").as("chunk_id"), col("col").as("chunk"))
  }
}

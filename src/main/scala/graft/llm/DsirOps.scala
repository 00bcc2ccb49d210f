package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling").
  * Given a small TARGET sample (the domain you want more of — e.g.
  * Wikipedia+books for a general-purpose LM) and the RAW crawl, score
  * every raw document by how target-like its hashed n-gram distribution
  * is, and keep the highest-scoring slice. This is the model-free
  * data-selection tier next to the hashed linear classifier
  * (`TextStatsOps.hashedClassifierLogit`): no trained weights, just two
  * corpus histograms and a log-likelihood ratio.
  *
  * Mechanics (paper §3): features are hashed unigrams+bigrams into B
  * buckets; fit bag-of-words models p (target) and q (raw) with +1
  * smoothing; a document's importance weight is
  * `log w(x) = Σ_b count_x[b]·(log p[b] − log q[b])`.
  *
  * Engine shape, built for 100 TB:
  *   - The two histograms are ONE map-side-combined aggregation each,
  *     bounded at B rows per partition on the wire (B is 10^4-ish;
  *     the target sample is small by definition).
  *   - The per-bucket log-ratio table is computed driver-side from the
  *     two B-row histograms (a bounded collect, same idiom as the
  *     IVF/PQ centroid training) and ships as an array LITERAL — so
  *     scoring is a zero-shuffle row-local HOF dot product at scan
  *     throughput, exactly the `hashedClassifierLogit` plan.
  *   - Ratios are integer MICRO-units (`floor(1e6·x + 0.5)`, a fixed
  *     rounding both Java and SQL engines express identically), so the
  *     document score is a BIGINT dot product: exact, summation-order-
  *     free, and oracle-checkable — the one float step (the two `ln`
  *     calls per bucket) happens once per BUCKET driver-side, never
  *     per row, and lands on an integer grid where a 1-ulp libm
  *     difference cannot move the result.
  *   - Selection is deterministic top-k by (score desc, id) —
  *     TakeOrderedAndProject, never a global sort. The paper's Gumbel
  *     resampling variant adds seeded noise before the same top-k; see
  *     `gumbelTopK` (spec-covered — seeded noise is engine-specific,
  *     so the deterministic tier is what faces the oracle).
  *
  * The word→bucket hash is the md5-prefix idiom (engine-portable, like
  * the classifier and the deterministic samplers), NOT xxhash64, so any
  * SQL engine replays the features exactly.
  */
object DsirOps {

  /** Hashed unigram+bigram feature strings of a text column. Bigrams
    * join adjacent surface words with one space; a <2-word document has
    * no bigrams (guarded — Spark's `sequence(1, 0)` would count down).
    * Surface words, not the dedup-normalized tokens: DSIR's histograms
    * are over raw text like the classifier's. */
  def features(text: Column): Column = {
    // NULL text ⇒ no features (not a NULL array): keeps scoreMicro at
    // 0 for null docs, matching the oracle's LEFT JOIN + coalesce(0)
    val ws = TextStatsOps.words(coalesce(text, lit("")))
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ws, bigrams)
  }

  /** Feature→bucket: first 8 md5 hex chars mod B (engine-portable —
    * the shared [[TextStatsOps.md5Bucket]] expression the hashed
    * classifier also uses, so both oracles replay ONE hash). */
  def bucketOf(feature: Column, buckets: Int): Column =
    TextStatsOps.md5Bucket(feature, buckets)

  /** Corpus bucket histogram: (bucket, cnt) with one map-side-combined
    * aggregation — ≤B rows per partition cross the wire regardless of
    * corpus size. Buckets with zero mass are absent (the table builder
    * fills them via smoothing). */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(features(col(textCol))).as("f"))
      .select(bucketOf(col("f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket micro-log-ratio table
    * `floor(1e6·(ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))) + 0.5)` from
    * the target and raw corpora. Two bounded collects (≤B rows each).
    * The +1/(tot+B) Laplace smoothing keeps empty buckets finite and
    * matches the paper's bag-of-words fit. */
  def logRatioTableMicro(target: DataFrame, raw: DataFrame,
      textCol: String, buckets: Int): Seq[Long] = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    def hist(df: DataFrame): (Map[Int, Long], Long) = {
      val m = bucketCounts(df, textCol, buckets).collect()
        .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      (m, m.values.sum)
    }
    val (tm, tTot) = hist(target)
    val (rm, rTot) = hist(raw)
    (0 until buckets).map { b =>
      val t = tm.getOrElse(b, 0L)
      val r = rm.getOrElse(b, 0L)
      val x = math.log((t + 1).toDouble / (tTot + buckets)) -
        math.log((r + 1).toDouble / (rTot + buckets))
      math.floor(1e6 * x + 0.5).toLong
    }
  }

  /** Document importance score in micro-log units: the BIGINT dot
    * product of the document's bucket counts with the ratio table.
    * Zero shuffle — the table rides the plan as a literal and the sum
    * is a row-local HOF fold (empty text scores 0). */
  def scoreMicro(text: Column, ratiosMicro: Seq[Long]): Column = {
    val tab = typedLit(ratiosMicro)
    val n = ratiosMicro.size
    aggregate(
      transform(features(text),
        f => element_at(tab, bucketOf(f, n).cast("int") + 1)),
      lit(0L), (a, b) => a + b)
  }

  /** Deterministic DSIR selection: top-k documents by
    * (score desc, id asc) — a distributed TakeOrderedAndProject. */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      ratiosMicro: Seq[Long], k: Int): DataFrame =
    df.withColumn("score_micro", scoreMicro(col(textCol), ratiosMicro))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)

  /** The paper's resampling variant: perturb each score with seeded
    * Gumbel noise before the top-k, drawing a SAMPLE from the softmax
    * of scores rather than the argmax slice (Gumbel-top-k trick).
    * Deterministic for a fixed seed via the md5-uniform (engine-
    * portable noise, though the float `ln(ln())` chain makes this tier
    * spec-covered rather than oracle-faced). `temperature` in micro-log
    * units scales how sharply selection concentrates on high scores. */
  def gumbelTopK(df: DataFrame, idCol: String, textCol: String,
      ratiosMicro: Seq[Long], k: Int, temperature: Double = 1e6,
      salt: String = "dsir"): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    val u = (graft.operators.SampleOps.hashU32(col(idCol), salt)
      .cast("double") + lit(0.5)) / lit(4294967296.0) // (0,1) open
    df.withColumn("score_micro", scoreMicro(col(textCol), ratiosMicro))
      .withColumn("gumbel_key",
        col("score_micro") / lit(temperature) - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}

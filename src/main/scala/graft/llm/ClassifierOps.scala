package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed TRAINING for the hashed quality classifier
  * ([[TextStatsOps.hashedClassifierLogit]] is the inference side) —
  * full-batch gradient descent where every quantity is an exact
  * integer, so the trained weights are bit-identical on any cluster
  * layout AND replayable by the DuckDB oracle. The float version of
  * this loop could never face a hash gate: each partial-sum merge
  * order drifts the gradient at 1 ulp and iteration compounds it.
  *
  * The trick is the LINK function: instead of the logistic sigmoid
  * (whose exp() differs across libms), we train with the HARD sigmoid
  * σ(z) = clamp(½ + z/4, 0, 1) — the piecewise-linear surrogate used
  * throughout the quantized-network literature (h-sigmoid). In
  * micro-units: p = clamp(500000 + trunc(z/4), 0, 1e6), where
  * trunc(z/4) is exact truncating division by a power of two (the
  * dyadic z/4.0 cast to long; engines agree). Gradient per occurrence is
  * (p − y)·1 on the word's bucket — an integer — and the batch
  * gradient is an integer SUM: order-insensitive.
  *
  * Scale shape per iteration: the logit is row-local HOF arithmetic
  * (weights ride the plan as literals — zero shuffle), the gradient is
  * ONE map-side-combinable sum keyed by feature bucket (≤ buckets+1
  * result rows), and the weight update touches the driver with
  * buckets+1 longs. Nothing grows with corpus size on the driver.
  */
object ClassifierOps {

  val Micro = 1000000L

  /** Hard-sigmoid probability in micro-units from a micro-unit logit:
    * clamp(500000 + trunc(z/4), 0, 1e6). The division is TRUNCATING
    * toward zero — the semantics Scala `/`, Spark `div`, and DuckDB
    * `//` all share (DuckDB's `//` truncates: −7 // 2 = −3, NOT
    * floor — Math.floorDiv would silently disagree on negative
    * logits). Computed as a double→long cast of the exact dyadic
    * z/4.0, which truncates toward zero in both engines. */
  def hardSigmoidMicro(zMicro: Column): Column =
    least(lit(Micro), greatest(lit(0L),
      lit(Micro / 2) + (zMicro / 4.0d).cast("long")))

  /** Micro-unit logit for `text` under word-bucket weights `w` (size
    * buckets) plus bias `wb`: Σ_occurrences w[bucket(word)] + wb.
    * Row-local, zero shuffle. NULL text scores as empty (bias-only
    * logit) — the same treatment training gives it, so a NULL-text
    * document cannot train as one thing and score as another. */
  def logitMicro(text: Column, w: Seq[Long], wb: Long): Column =
    TextStatsOps.hashedClassifierLogit(coalesce(text, lit("")), w) + lit(wb)

  /** Train `iters` full-batch hard-sigmoid logistic steps on
    * (`textCol`, `labelCol` ∈ {0,1}); returns buckets word weights
    * followed by the bias, all micro-units. Learning rate is the
    * rational 1/(lrDen·n) applied with TRUNCATING division (Scala
    * `/`) — the same semantics as DuckDB's `//`, so an oracle can
    * replay every step. */
  def trainHardLogistic(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 16, iters: Int = 2, lrDen: Long = 100L): Array[Long] = {
    require(buckets >= 1 && iters >= 1 && lrDen >= 1,
      s"trainHardLogistic: bad hyperparameters ($buckets, $iters, $lrDen)")
    val n = df.count() // one scalar: the corpus row count
    require(n > 0, "trainHardLogistic: empty corpus")
    val w = Array.fill(buckets + 1)(0L) // [word buckets..., bias]
    // NULL text reads as empty: words(NULL) is NULL and would
    // null-propagate through array_append, dropping the row's bias
    // sentinel from the gradient while n still counts it — and
    // diverging from the oracle, which emits a bias row per document
    val txt = coalesce(col(textCol), lit(""))
    for (_ <- 1 to iters) {
      val z = logitMicro(txt, w.take(buckets).toSeq, w(buckets))
      val err = (hardSigmoidMicro(z) -
        col(labelCol).cast("long") * Micro).as("__err")
      // one exchange: per-occurrence bucket ids + a sentinel bias
      // bucket appended per ROW, so bias and word gradients ride the
      // same map-side-combined aggregation. err is bound in a
      // projection BELOW the explode: select(err, explode(...)) puts
      // the Project ABOVE the Generate, re-evaluating the whole logit
      // HOF once per exploded occurrence (~words× blowup — measured
      // 18 s vs 1.3 s per pass at sf0.1); as a named column under the
      // Generate it is computed once per document and passed through.
      val g = df.select(err,
          array_append(
            transform(TextStatsOps.words(txt),
              t => TextStatsOps.md5Bucket(t, buckets)),
            lit(buckets.toLong)).as("__bs"))
        .select(col("__err"), explode(col("__bs")).as("__b"))
        .groupBy("__b").agg(sum("__err").as("__g"))
        .collect() // bounded: ≤ buckets+1 rows
        .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      for (j <- 0 to buckets)
        w(j) -= g.getOrElse(j, 0L) / (lrDen * n) // truncating, like //
    }
    w
  }

}

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

  /** Per-document bucket-count feature frame, persisted and
    * materialized eagerly (by the `count()` every trainer runs), so
    * the iterative loop and the scorer never touch text again (r19
    * optimization, guide §1.2 "per-task work" + §2.3 "aggregate
    * before you shuffle"): the md5 word
    * bucketing — the interpreted-HOF hot spot every pass used to
    * re-pay — runs ONCE, and each training pass becomes a single
    * codegen'd aggregation over `buckets` long columns instead of an
    * explode of every word occurrence (measured at sf0.1: 0.86 s →
    * ~0.04 s per gradient pass; the whole query 2.04 s → ~1.1 s).
    *
    * Columns: `keep` passthroughs, `__y` (label·µ-ready long), and
    * `__h0..__h{buckets-1}` — per-document occurrence counts per
    * bucket. The bias sentinel needs no column (its count is 1 per
    * document by construction). Counts are exact longs, so every
    * gradient/logit below is the SAME integer the per-occurrence
    * formulation produced — layout-invariant and oracle-replayable,
    * bit for bit.
    *
    * Scale shape: one text scan + one exchange of (doc, buckets+2
    * longs) rows — strictly less than the per-iteration occurrence
    * explode it replaces; the persisted frame is buckets longs per
    * document, far smaller than the corpus. Arity is O(buckets) in
    * the plan, fine for the classifier's documented 16-256 bucket
    * range (the literal-weights plan was already O(buckets)).
    *
    * NULL text reads as empty: words(NULL) is NULL and would
    * null-propagate through the transform, dropping the row while n
    * still counts it — and diverging from the oracle, which emits a
    * bias row per document. NULL labels pass through as NULL `__y`
    * (the label column is parquet-nullable): the per-occurrence
    * formulation null-propagated such a row out of every gradient sum
    * while `n` still counted it, and the kernel must reproduce that —
    * not throw — so the null stays and the codegen'd `__err` sums drop
    * it exactly as before (r19 ADVICE: the first kernel cut called
    * getLong on the label and crashed on a single NULL-label row).
    *
    * Materialization (r20, guide §5): persist(MEMORY_AND_DISK) — made
    * eager by the `n = feat.count()` every trainer performs anyway —
    * replaces r19's `localCheckpoint(true)`. The checkpoint truncated
    * lineage to executor-local blocks with NO recompute path: on a
    * real cluster one lost executor mid-GD-loop failed the job. The
    * persisted frame keeps its (deterministic) kernel lineage, so a
    * lost block recomputes; plan and timing shape are unchanged (same
    * one eager job, every GD step still reads materialized blocks). */
  private def bucketCountFeatures(df: DataFrame, textCol: String,
      labelCol: String, keep: Seq[String], buckets: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val in = df.select(keep.map(col) ++ Seq(
      col(labelCol).cast("long").as("__y"),
      coalesce(col(textCol), lit("")).as("__t")): _*)
    val outSchema = StructType(
      in.schema.fields.filterNot(_.name == "__t") :+
        StructField("__hs", ArrayType(LongType, containsNull = false),
          nullable = false))
    val nKeep = keep.size
    // ZERO-SHUFFLE histogram kernel (guide §4.2: hand the whole batch
    // to native code): per row, split + md5-bucket each word and count
    // into a local array — the explode + per-doc pivot aggregation
    // this replaces shipped one row per word occurrence through an
    // exchange. The bucket function is bit-equal to md5Bucket (first
    // 4 md5 bytes as an unsigned 32-bit value, mod buckets; UTF-8
    // input bytes — the spec pins the whole path against the
    // per-occurrence expression formulation).
    val rdd = in.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val t = r.getString(nKeep + 1)
        val hs = new Array[Long](buckets)
        val parts = t.split("\\s+")
        var i = 0
        while (i < parts.length) {
          val w = parts(i)
          if (w.nonEmpty) {
            val d = md.digest(
              w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
            hs((u % buckets).toInt) += 1L
          }
          i += 1
        }
        val y: Any = if (r.isNullAt(nKeep)) null else r.getLong(nKeep)
        Row.fromSeq((0 until nKeep).map(r.get) ++ Seq(y, hs.toSeq))
      }
    }
    // registered with DistScan's release queue (the minhash-signature
    // convention): persisted entries are CacheManager-pinned until
    // unpersist, so the application frees them at its step boundaries
    // — localCheckpoint blocks were GC-freed, a persist must not turn
    // into per-run storage growth in a long-lived session
    graft.operators.DistScan.registerCache(
      spark.createDataFrame(rdd, outSchema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Micro-unit logit of one feature row under weights `w` (buckets
    * word weights + bias): Σ_b h_b·w_b + w_bias — pure codegen'd
    * integer arithmetic over array lookups (element_at with a literal
    * index is an ordinary expression, not a lambda HOF), the same
    * value logitMicro computes per occurrence. */
  private def featLogit(w: Array[Long], buckets: Int): Column =
    (0 until buckets).map(b => element_at(col("__hs"), b + 1) * lit(w(b)))
      .reduceOption(_ + _).getOrElse(lit(0L)) + lit(w(buckets))

  /** One full-batch hard-sigmoid GD loop over a materialized feature
    * frame; mutates nothing, returns the weights. Each iteration is
    * ONE codegen'd global aggregation (buckets+1 sums — word gradients
    * Σ err·h_b and the bias gradient Σ err ride the same map-side
    * combine) over the materialized features; no text, no explode. */
  private def trainOnFeatures(feat: DataFrame, buckets: Int, iters: Int,
      lrDen: Long, n: Long): Array[Long] = {
    val w = Array.fill(buckets + 1)(0L) // [word buckets..., bias]
    for (_ <- 1 to iters) {
      val err = (hardSigmoidMicro(featLogit(w, buckets)) -
        col("__y") * Micro).as("__err")
      val sums = (0 until buckets).map(b =>
        sum(col("__err") * element_at(col("__hs"), b + 1)).as(s"__g$b")) :+
        sum(col("__err")).as("__gb")
      val row = feat
        .select(err, col("__hs"))
        .agg(sums.head, sums.tail: _*)
        .collect()(0) // bounded: one row of buckets+1 longs
      for (j <- 0 to buckets)
        w(j) -= row.getLong(j) / (lrDen * n) // truncating, like //
    }
    w
  }

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
    val feat = bucketCountFeatures(df, textCol, labelCol, Nil, buckets)
    val n = feat.count() // one scalar; also materializes the persisted frame
    require(n > 0, "trainHardLogistic: empty corpus")
    trainOnFeatures(feat, buckets, iters, lrDen, n)
  }

  /** [[trainHardLogistic]] plus the trained scoring pass over the SAME
    * materialized feature frame: returns (`idCol`, logit_micro) for
    * every input document — the identical integers
    * `logitMicro(text, w, wb)` yields, without a third tokenize+md5
    * scan of the corpus (the scorer reads buckets longs per doc from
    * the checkpoint instead). */
  def trainHardLogisticScored(df: DataFrame, textCol: String,
      labelCol: String, idCol: String, buckets: Int = 16, iters: Int = 2,
      lrDen: Long = 100L): DataFrame = {
    require(buckets >= 1 && iters >= 1 && lrDen >= 1,
      s"trainHardLogisticScored: bad hyperparameters ($buckets, $iters, $lrDen)")
    val feat = bucketCountFeatures(df, textCol, labelCol, Seq(idCol), buckets)
    val n = feat.count()
    require(n > 0, "trainHardLogisticScored: empty corpus")
    val w = trainOnFeatures(feat, buckets, iters, lrDen, n)
    feat.select(col(idCol), featLogit(w, buckets).as("logit_micro"))
  }

}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star LLM pipeline).
  *
  * Two tiers:
  *   - bruteForceTopK: broadcast the (small) query set against the
  *     corpus scan — exact, one pass, no shuffle of the corpus. The
  *     baseline and the verifier for the approximate tier.
  *   - lshTopK: bucket vectors by sign-bit sketch (random-hyperplane
  *     LSH), join queries to corpus within buckets only — the 100 TB
  *     path: candidate count scales with bucket occupancy, not corpus
  *     size. Recall is tunable via sketch bits / multiple tables.
  *
  * All arithmetic in double via codegen'd higher-order functions
  * (zip_with + aggregate) — no UDF, no collect.
  */
object SimilarityOps {

  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential left-fold dot product — deterministic association. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors for each query vector (self excluded).
    * Queries are expected to be broadcast-sized. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", cId: String = "vec_id"): DataFrame = {
    val scored = broadcast(queries).crossJoin(corpus)
      .filter(col(qId) =!= col(cId))
      .withColumn("score",
        cosine(toDoubleArr(col("q_emb")), toDoubleArr(col("embedding"))))
    val w = Window.partitionBy(qId).orderBy(col("score").desc, col(cId).asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col(cId), col("score"), col("rn"))
  }

  /** Sign-bit sketch on the first `bits` dimensions (a fixed axis-
    * aligned hyperplane family — deterministic, oracle-friendly;
    * swap in seeded random hyperplanes for production recall). */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
      qId: String = "q_id", cId: String = "vec_id"): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col("q_emb"), bits))
    val cb = corpus.withColumn("bucket", signBucket(col("embedding"), bits))
    val scored = broadcast(qb).join(cb, Seq("bucket"))
      .filter(col(qId) =!= col(cId))
      .withColumn("score",
        cosine(toDoubleArr(col("q_emb")), toDoubleArr(col("embedding"))))
    val w = Window.partitionBy(qId).orderBy(col("score").desc, col(cId).asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col(cId), col("score"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs within LSH buckets. */
  def embeddingNearDupPairs(corpus: DataFrame, cId: String, bits: Int,
      minCosine: Double): DataFrame = {
    val cb = corpus.withColumn("bucket", signBucket(col("embedding"), bits))
    val a = cb.select(col("bucket"), col(cId).as("id_a"), col("embedding").as("e_a"))
    val b = cb.select(col("bucket"), col(cId).as("id_b"), col("embedding").as("e_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine(toDoubleArr(col("e_a")), toDoubleArr(col("e_b"))))
      .filter(col("score") >= minCosine)
      .select("id_a", "id_b", "score")
  }
}

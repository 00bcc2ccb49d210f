package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling (reference: generic.py:4383 sample(weights=)).
  *
  * pandas draws from the normalized weight vector in one process; the
  * distributed equivalent is Efraimidis–Spirakis A-Res: give every row
  * the key u^(1/w) (u ~ U(0,1) seeded per row) and keep the n largest —
  * a weighted reservoir that needs ONE pass and a distributed top-k
  * (TakeOrderedAndProject), never a global sort or a driver-side cdf.
  * Deterministic for a fixed seed: u comes from xxhash64(id, seed).
  */
object SampleOps {

  /** Weighted sample WITHOUT replacement of n rows. `idCol` must be
    * unique and non-null; rows with weight <= 0 or null are excluded
    * (pandas semantics). */
  def weightedSample(df: DataFrame, n: Int, weightCol: String, idCol: String,
      seed: Long = 42L): DataFrame = {
    // u in (0,1): 64-bit hash → positive fraction; key = ln(u)/w is the
    // log-space form of u^(1/w) (monotone ⇒ same top-k, no underflow).
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000007L))
      .cast("double") + 1.0) / 1000000009.0
    val key = log(u) / col(weightCol)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__k", key)
      .orderBy(col("__k").desc)
      .limit(n)
      .drop("__k")
  }
}

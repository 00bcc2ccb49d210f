package graft

import graft.functions.CosineSimilarity
import graft.llm.SimilarityOps
import org.apache.spark.sql.functions._

/** Native codegen cosine expression: bit-identical to the higher-order
  * composition, null-safe, and usable from SQL after registration. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (0L until 200L).map { i =>
    (i, (0 until 64).map(j => math.sin(i * 17 + j * 3).toFloat).toArray)
  }.toDF("id", "v")

  test("native expression matches zip_with/aggregate composition bit-for-bit") {
    CosineSimilarity.register(spark)
    val a = vecs.select(col("id").as("ia"), col("v").as("va"))
    val b = vecs.select(col("id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib")).limit(500)
    val both = pairs.select(
      expr("cosine_sim(va, vb)").as("native"),
      SimilarityOps.cosine(SimilarityOps.toDoubleArr(col("va")),
        SimilarityOps.toDoubleArr(col("vb"))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("self similarity is 1, null propagates") {
    CosineSimilarity.register(spark)
    val r = vecs.select(expr("cosine_sim(v, v)").as("s")).agg(
      min(col("s")).as("mn"), max(col("s")).as("mx")).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 &&
      math.abs(r.getDouble(1) - 1.0) < 1e-12)
    val n = vecs.select(expr("cosine_sim(v, CAST(NULL AS ARRAY<FLOAT>))").as("s"))
      .filter(col("s").isNull).count()
    assert(n == 200)
  }

  test("extensions installer registers the function and asof strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    val strategies =
      org.apache.spark.sql.graftbridge.Bridge.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsofJoinStrategy), strategies.toString)
  }
}

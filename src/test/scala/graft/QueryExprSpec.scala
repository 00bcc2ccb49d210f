package graft

import graft.expr.QueryExpr
import org.apache.spark.sql.functions._

/** pandas query()-grammar translator spec (reference:
  * tests/frame/test_query_eval.py idioms). */
class QueryExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, "c"))
    .toDF("id", "v", "s")

  private def ids(q: String, vars: Map[String, Any] = Map.empty): Set[Int] =
    df.filter(QueryExpr.translate(q, vars)).select("id").as[Int].collect().toSet

  test("comparisons and boolean operators") {
    assert(ids("v > 15 and s == 'a'") == Set(3))
    assert(ids("v <= 10 or v >= 40") == Set(1, 4))
    assert(ids("not (s == 'a')") == Set(2, 4))
    assert(ids("~(s == 'a') & (v < 25)") == Set(2))
  }

  test("in / not in with list literals") {
    assert(ids("s in ['a', 'b']") == Set(1, 2, 3))
    assert(ids("id not in [1, 2]") == Set(3, 4))
  }

  test("arithmetic and precedence") {
    assert(ids("v * 2 + 5 > 45") == Set(3, 4))
    assert(ids("v / 10 == 2") == Set(2))
    assert(ids("-v < -35") == Set(4))
    assert(ids("id % 2 == 0") == Set(2, 4))
  }

  test("@var resolution and backtick identifiers") {
    assert(ids("v > @cutoff", Map("cutoff" -> 25.0)) == Set(3, 4))
    assert(ids("`v` == 10.0") == Set(1))
    intercept[IllegalArgumentException](ids("v > @missing"))
  }

  test("rejects trailing garbage") {
    intercept[IllegalArgumentException](ids("v > 1 x"))
  }

  test("eval assignments: sequential targets, ==-vs-= disambiguation") {
    import graft.core.PFrame
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val out = PFrame(df).eval("z = v * 2 + @off\nbig = z >= 41", Map("off" -> 1))
      .df.orderBy("id").collect()
    assert(out(0).getDouble(2) == 21.0 && !out(0).getBoolean(3))
    assert(out(1).getDouble(2) == 41.0 && out(1).getBoolean(3))
    // '==' inside the expr must not be mistaken for an assignment
    val flagged = PFrame(df).eval("eq = v == 10.0").df.orderBy("id").collect()
    assert(flagged(0).getBoolean(2) && !flagged(1).getBoolean(2))
    intercept[IllegalArgumentException](PFrame(df).eval("v + 1"))
  }
}

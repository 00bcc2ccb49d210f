package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `levenshtein_within(a, b, k)` — TRUE iff edit distance ≤ k, via a
  * BANDED dynamic program with per-row early exit: O(min(n,m)·k) work
  * and O(m) memory instead of the builtin `levenshtein`'s full O(n·m)
  * table. For the record-linkage tier (fuzzyPairs) the predicate is
  * `dist <= k` with k ∈ {0,1,2}: the band is 3-5 cells wide, so
  * candidate filtering costs ~k·len instead of len², and a pair whose
  * running band minimum exceeds k exits before touching the rest of
  * the string. The length pre-check (|n−m| > k → false) rejects most
  * non-candidates in O(1).
  *
  * Distance is over UTF-16 code units (same convention as Spark's
  * builtin on the BMP; spec-pinned equal to the builtin's result on
  * random strings). The hot loop lives in a static helper the
  * generated code calls directly — one non-virtual call per row
  * inside whole-stage codegen. */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string, int), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "levenshtein_within"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevenshteinWithin.within(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) =>
      s"graft.functions.LevenshteinWithin.within($a, $b, $k)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): LevenshteinWithin =
    copy(first = f, second = s, third = t)
}

object LevenshteinWithin {
  val fnName = "levenshtein_within"

  /** Banded DP with early exit; public + JVM-static-reachable so the
    * generated code calls it directly. */
  def within(au: UTF8String, bu: UTF8String, k: Int): Boolean = {
    if (k < 0) return false
    val a = au.toString; val b = bu.toString
    val n = a.length; val m = b.length
    if (math.abs(n - m) > k) return false
    if (k == 0) return a == b
    if (n == 0) return m <= k
    val inf = k + 1
    var prev = new Array[Int](m + 2)
    var curr = new Array[Int](m + 2)
    // row 0: distance j for j ≤ k, INF beyond the band
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    prev(m + 1) = inf
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      curr(lo - 1) = if (lo == 1 && i <= k) i else inf
      var rowMin = inf
      j = lo
      while (j <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < d) d = del
        val ins = curr(j - 1) + 1
        if (ins < d) d = ins
        val dc = if (d > inf) inf else d
        curr(j) = dc
        if (dc < rowMin) rowMin = dc
        j += 1
      }
      if (hi + 1 <= m + 1) curr(hi + 1) = inf // next row reads INF there
      if (rowMin > k) return false // the whole band overflowed: early exit
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m) <= k
  }

  /** Idempotent session-level registration (Verify/Bench path). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => LevenshteinWithin(exprs(0), exprs(1), exprs(2)),
      "built-in")
}

package graft

import graft.operators.AsofOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** merge_asof semantics on hand-built trades/quotes (FIXTURES.md
  * `asofPair`; reference tests/reshape/merge/test_merge_asof.py). */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // trades: (id, ticker, time); quotes: (ticker, time, px)
  private lazy val trades = Seq(
    (1L, "A", ts(100)), (2L, "A", ts(200)), (3L, "A", ts(50)),
    (4L, "B", ts(150)), (5L, "C", ts(100)))
    .toDF("id", "by", "ts")
  private lazy val quotes = Seq(
    ("A", ts(90), 1.0), ("A", ts(200), 2.0), ("A", ts(300), 3.0),
    ("B", ts(100), 10.0), ("B", ts(160), 11.0))
    .toDF("by", "ts", "px")

  private def run(direction: String, allowExact: Boolean = true,
      tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsofOps.asof(trades, quotes, "ts", Seq("by"), Seq("px"),
        direction, allowExact, tol.map(_ * 1000000L))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap

  test("backward with exact matches") {
    assert(run("backward") == Map(
      1L -> Some(1.0),  // 100 ← quote@90
      2L -> Some(2.0),  // 200 ← exact quote@200
      3L -> None,       // 50: nothing before
      4L -> Some(10.0), // 150 ← quote@100
      5L -> None))      // no C quotes
  }

  test("backward excluding exact matches") {
    assert(run("backward", allowExact = false)(2L) == Some(1.0)) // skips @200
  }

  test("forward direction") {
    assert(run("forward") == Map(
      1L -> Some(2.0),  // 100 → quote@200
      2L -> Some(2.0),  // exact
      3L -> Some(1.0),  // 50 → quote@90
      4L -> Some(11.0), // 150 → quote@160
      5L -> None))
  }

  test("tolerance cuts distant matches") {
    val out = run("backward", tol = Some(20L))
    assert(out(1L) == Some(1.0)) // delta 10s ≤ 20s
    assert(out(4L) == None)      // delta 50s > 20s
  }

  test("nearest picks closer side, backward on ties") {
    val out = AsofOps.asofNearest(trades, quotes, "ts", Seq("by"), Seq("px"), "id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out == Map(
      1L -> Some(1.0),  // back delta 10 < fwd delta 100
      2L -> Some(2.0),  // exact
      3L -> Some(1.0),  // only forward exists
      4L -> Some(11.0), // fwd delta 10 < back delta 50
      5L -> None))
  }
}

package graft

import graft.core.PFrame
import graft.operators.{SelectionOps, SetOps, MissingOps, JoinOps}
import org.apache.spark.sql.functions._

/** Unit specs for the core wrapper + selection/set/missing/join
  * operators on small in-memory frames (FIXTURES.md §B idioms). */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("PFrame.rename handles swap mappings") {
    val pf = PFrame(Seq((1, 2)).toDF("a", "b"), indexCols = Seq("a"))
    val out = pf.rename("a" -> "b", "b" -> "a")
    assert(out.df.columns.toSeq == Seq("b", "a"))
    assert(out.indexCols == Seq("b"))
    val row = out.df.collect().head
    assert(row.getAs[Int]("b") == 1 && row.getAs[Int]("a") == 2)
  }

  test("PFrame aligned binOp outer-joins on index with null for unmatched") {
    val l = PFrame(Seq((1, 10.0), (2, 20.0)).toDF("k", "v"), Seq("k"))
    val r = PFrame(Seq((2, 1.0), (3, 2.0)).toDF("k", "v"), Seq("k"))
    val sum = l.plus(r).df.orderBy("k").collect()
    assert(sum.length == 3)
    val byK = sum.map(x => x.getInt(0) -> Option(x.get(1))).toMap
    assert(byK(1).isEmpty && byK(2).contains(21.0) && byK(3).isEmpty)
  }

  test("PFrame.combineFirst coalesces left over right") {
    val l = PFrame(Seq((1, Some(10.0)), (2, None)).toDF("k", "v"), Seq("k"))
    val r = PFrame(Seq((1, 99.0), (2, 5.0), (3, 7.0)).toDF("k", "v"), Seq("k"))
    val out = l.combineFirst(r).df.orderBy("k").collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(out == Map(1 -> 10.0, 2 -> 5.0, 3 -> 7.0))
  }

  test("dropDuplicates keep semantics") {
    val df = Seq((1, "a", 100), (2, "a", 200), (3, "b", 300))
      .toDF("id", "k", "ord")
    def ids(keep: String) =
      SelectionOps.dropDuplicates(df, Seq("k"), keep, Seq(col("ord")))
        .select("id").as[Int].collect().toSet
    assert(ids("first") == Set(1, 3))
    assert(ids("last") == Set(2, 3))
    assert(ids("none") == Set(3))
  }

  test("nlargest drops null keys and breaks ties deterministically") {
    val df = Seq((1, Some(5.0)), (2, None), (3, Some(5.0)), (4, Some(1.0)))
      .toDF("id", "v")
    val top = SelectionOps.nlargest(df, 2, Seq("v"), Seq("id"))
      .select("id").as[Int].collect().toSeq
    assert(top == Seq(1, 3))
  }

  test("tail returns last n in ascending order") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val out = SelectionOps.tail(df, 2, Seq(col("x"))).as[Int].collect().toSeq
    assert(out == Seq(4, 5))
  }

  test("SetOps.union aligns by name") {
    val a = Seq((1, "x")).toDF("n", "s")
    val b = Seq(("y", 2)).toDF("s", "n")
    val out = SetOps.union(a, b).orderBy("n").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "x"), (2, "y")))
  }

  test("ffill with limit only bridges short gaps") {
    val df = Seq(
      (1, Some(1.0)), (2, None), (3, None), (4, None), (5, None), (6, None))
      .toDF("ord", "v")
    val out = df.select(col("ord"),
      MissingOps.ffillLimit(col("v"), Nil, "ord", 2).as("f"))
      .orderBy("ord").collect().map(r => Option(r.get(1)))
    assert(out.toSeq == Seq(Some(1.0), Some(1.0), Some(1.0), None, None, None))
  }

  test("merge with indicator labels provenance") {
    val l = Seq((1, "l1"), (2, "l2")).toDF("k", "lv")
    val r = Seq((2, "r2"), (3, "r3")).toDF("k", "rv")
    val out = JoinOps.merge(l, r, Seq("k"), "outer", indicator = true)
      .select("k", "_merge").collect()
      .map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(out == Map(1 -> "left_only", 2 -> "both", 3 -> "right_only"))
  }

  test("merge suffixes overlapping value columns") {
    val l = Seq((1, 1.0)).toDF("k", "v")
    val r = Seq((1, 2.0)).toDF("k", "v")
    val out = JoinOps.merge(l, r, Seq("k"), "inner")
    assert(out.columns.toSet == Set("k", "v_x", "v_y"))
  }

  test("validateKeys flags duplicate join keys") {
    val dup = Seq((1, "a"), (1, "b")).toDF("k", "v")
    assert(!JoinOps.validateKeys(dup, Seq("k"), unique = true))
    assert(JoinOps.validateKeys(dup.limit(1), Seq("k"), unique = true))
  }

  test("frameCompare: differing cells only, both-NULL equal, missing " +
    "rows surface every compared column") {
    import graft.operators.SetOps
    val a = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 1.0), (2L, null, 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val b = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 9.0),   // v differs
      (2L, null, 2.0)   // identical incl. both-null s
      // k=3 missing
    ).toDF("k", "s", "v")
    val got = SetOps.frameCompare(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(got === Map(
      (1L, "v") -> (Some("1.0"), Some("9.0")),
      (3L, "s") -> (Some("c"), None),
      (3L, "v") -> (Some("3.0"), None)))

    // a missing row surfaces even columns where the present side is
    // NULL (presence markers, not NULL<=>NULL), and -0.0 == 0.0 is
    // NOT a diff (native comparison; string rendering would differ)
    val a2 = Seq[(Long, String, java.lang.Double)](
      (4L, null, 4.0), (5L, "e", -0.0)).toDF("k", "s", "v")
    val b2 = Seq[(Long, String, java.lang.Double)](
      (5L, "e", 0.0)).toDF("k", "s", "v")
    val got2 = SetOps.frameCompare(a2, b2, Seq("k"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(got2 === Map(
      (4L, "s") -> (None, None), // missing row, present side NULL
      (4L, "v") -> (Some("4.0"), None)))
  }

  test("linearFit recovers an exact line; degenerate groups are NULL") {
    import graft.operators.GroupOps
    val pts = Seq(
      ("a", 1L, 8L), ("a", 2L, 11L), ("a", 3L, 14L),   // y = 3x + 5
      ("b", 4L, 7L),                                    // 1 point
      ("c", 5L, 1L), ("c", 5L, 9L)                      // zero x-variance
    ).toDF("k", "x", "y")
    val got = GroupOps.linearFit(pts, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got("a") === ((3L, Some(3.0), Some(5.0))))
    assert(got("b") === ((1L, None, None)))
    assert(got("c") === ((2L, None, None)))
  }
}

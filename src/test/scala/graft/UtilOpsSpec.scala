package graft

import graft.operators.{Formatter, SampleOps}
import graft.llm.SimilarityOps
import org.apache.spark.sql.functions._

/** Weighted sampling, to_string formatting, and the distributed
  * frame.dot (melt + join + agg) pattern. */
class UtilOpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: deterministic, right size, weight-biased") {
    val df = (1 to 2000).map(i => (i.toLong, if (i <= 100) 50.0 else 1.0))
      .toDF("id", "w")
    val s1 = SampleOps.weightedSample(df, 200, "w", "id").collect().map(_.getLong(0)).toSet
    val s2 = SampleOps.weightedSample(df, 200, "w", "id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "not deterministic for fixed seed")
    assert(s1.size == 200)
    // the 100 heavy rows (50× weight) must be drawn far above their
    // uniform share (100/2000 * 200 = 10); expect most of them present
    val heavy = s1.count(_ <= 100)
    assert(heavy > 60, s"weight bias missing: $heavy heavy rows in sample")
  }

  test("weightedSample excludes non-positive and null weights") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0)).toDF("id", "w")
      .union(Seq((4L, Option.empty[Double])).toDF("id", "w"))
    val got = SampleOps.weightedSample(df, 10, "w", "id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("toStringTable renders aligned head with ellipsis") {
    val df = Seq((1, "a", 1.5), (22, "bb", 2.25), (333, "ccc", 30.0))
      .toDF("id", "s", "v")
    val out = Formatter.toStringTable(df.orderBy("id"), 2)
    val lines = out.split("\n")
    assert(lines(0) == "id  s      v")
    assert(lines(1) == " 1  a    1.5")
    assert(lines(2) == "22  bb  2.25")
    assert(lines(3) == "...")
  }

  test("toHtmlTable / toLatexTable render escaped head") {
    val df = Seq((1, "a<b", 1.5), (2, "x&y", 2.0), (3, "c_d", 3.0))
      .toDF("id", "s", "v")
    val html = Formatter.toHtmlTable(df.orderBy("id"), 2)
    assert(html.contains("<th>id</th>") && html.contains("<td>a&lt;b</td>"))
    assert(html.contains("<td>x&amp;y</td>") && html.contains("colspan=3"))
    val tex = Formatter.toLatexTable(df.orderBy("id"), 3)
    assert(tex.contains("\\begin{tabular}{lll}"))
    // '$' in a cell must escape, not crash (appendReplacement group ref)
    val texDollar = Formatter.toLatexTable(Seq((1, "$5.00")).toDF("id", "amt"), 1)
    assert(texDollar.contains("\\$5.00"))
    assert(tex.contains("1 & a<b & 1.5 \\\\") || tex.contains("1 & a<b & 1.5"))
    assert(tex.contains("x\\&y") && tex.contains("c\\_d"))
    assert(!tex.contains("... \\\\"))
  }

  test("to_dict orients, itertuples streaming, from_records round-trip") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
      .orderBy("id")
    // pandas df.to_dict('records') / ('list') / default / ('split')
    assert(Formatter.toDictRecords(df) == Seq(
      Map("id" -> 1L, "s" -> "a", "v" -> 1.5),
      Map("id" -> 2L, "s" -> "b", "v" -> 2.5)))
    assert(Formatter.toDictList(df) == Map(
      "id" -> Seq(1L, 2L), "s" -> Seq("a", "b"), "v" -> Seq(1.5, 2.5)))
    assert(Formatter.toDictColumnMajor(df)("s") == Map(0L -> "a", 1L -> "b"))
    val (cols, data) = Formatter.toDictSplit(df)
    assert(cols == Seq("id", "s", "v") && data == Seq(
      Seq(1L, "a", 1.5), Seq(2L, "b", 2.5)))
    assert(Formatter.itertuples(df).toSeq == data)
    // from_records: first-seen column order, missing keys null,
    // types from first non-null value
    val back = Formatter.fromRecords(spark, Seq(
      Map("id" -> 1L, "s" -> "a"),
      Map("id" -> 2L, "v" -> 2.5)))
    assert(back.columns.toSeq == Seq("id", "s", "v"))
    assert(back.schema("v").dataType.typeName == "double")
    val rows = back.orderBy("id").collect().map(_.toSeq)
    assert(rows(0) == Seq(1L, "a", null) && rows(1) == Seq(2L, null, 2.5))

    // extended types round-trip: float/short/byte/decimal/temporals
    val ext = Formatter.fromRecords(spark, Seq(Map(
      "f" -> 1.5f, "sh" -> 3.toShort, "by" -> 7.toByte,
      "dec" -> new java.math.BigDecimal("2.500000000000000000"),
      "d" -> java.sql.Date.valueOf("2024-01-15"),
      "t" -> java.sql.Timestamp.valueOf("2024-01-15 10:30:00"),
      "ld" -> java.time.LocalDate.of(2024, 2, 2))))
    import org.apache.spark.sql.types._
    assert(ext.schema.fields.map(f => f.name -> f.dataType).toMap == Map(
      "f" -> FloatType, "sh" -> ShortType, "by" -> ByteType,
      "dec" -> DecimalType(38, 18), "d" -> DateType,
      "t" -> TimestampType, "ld" -> DateType))
    val er = ext.collect().head
    assert(er.getAs[Float]("f") == 1.5f && er.getAs[Short]("sh") == 3)
    assert(er.getAs[java.sql.Date]("ld") == java.sql.Date.valueOf("2024-02-02"))

    // unsupported and mixed-width types fail loudly AT CONSTRUCTION
    // with the column named — not as a deep ClassCastException
    val e1 = intercept[IllegalArgumentException] {
      Formatter.fromRecords(spark, Seq(Map("x" -> new Object)))
    }
    assert(e1.getMessage.contains("'x'") && e1.getMessage.contains("unsupported"))
    val e2 = intercept[IllegalArgumentException] {
      Formatter.fromRecords(spark, Seq(Map("n" -> 1), Map("n" -> 2L)))
    }
    assert(e2.getMessage.contains("'n'") && e2.getMessage.contains("mixed"))
  }

  test("frame.dot via melt+join+agg equals direct fold dot") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id").between(3, 6))
      .select(col("vec_id").as("id_b"), col("embedding").as("eb"))

    // scale path: explode to (id, pos, val), join on pos, sum-agg —
    // the matrix never sits on one node
    val am = a.select(col("id_a"), posexplode(col("ea")))
      .select(col("id_a"), col("pos"), col("col").cast("double").as("va"))
    val bm = b.select(col("id_b"), posexplode(col("eb")))
      .select(col("id_b"), col("pos"), col("col").cast("double").as("vb"))
    val dot1 = am.join(bm, "pos").groupBy("id_a", "id_b")
      .agg(sum(col("va") * col("vb")).as("dot"))

    // reference: deterministic sequential fold on paired vectors
    val dot2 = a.crossJoin(b).select(col("id_a"), col("id_b"),
      SimilarityOps.dot(SimilarityOps.toDoubleArr(col("ea")),
        SimilarityOps.toDoubleArr(col("eb"))).as("dot"))

    val m1 = dot1.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val m2 = dot2.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m1.keySet == m2.keySet)
    m1.foreach { case (k, v) => assert(math.abs(v - m2(k)) < 1e-9, s"$k") }
  }

  test("transpose: stats block flips rows/columns, double-transpose " +
      "round-trips, mixed types coerce to string, cap is loud") {
    import graft.operators.ReshapeOps
    import org.apache.spark.sql.types.StringType
    val df = Seq(("a", 1L, 10.5), ("b", 2L, 20.0)).toDF("k", "n", "x")
    val t = ReshapeOps.transpose(df, "k")
    assert(t.columns.toSeq == Seq("column", "a", "b"))
    val m = t.collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m == Map("n" -> ((1.0, 2.0)), "x" -> ((10.5, 20.0))), m.toString)
    // T.T: key values become columns and back — the pandas identity
    val tt = ReshapeOps.transpose(t, "column")
    assert(tt.columns.toSeq == Seq("column", "n", "x"))
    assert(tt.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet == Set(("a", 1.0, 10.5), ("b", 2.0, 20.0)))
    val s = ReshapeOps.transpose(Seq(("a", 1L, "z")).toDF("k", "n", "s"), "k")
    assert(s.schema.fields(1).dataType == StringType)
    val e = intercept[IllegalArgumentException](
      ReshapeOps.transpose(Seq.tabulate(5)(i => (s"k$i", i)).toDF("k", "v"),
        "k", maxCols = 3))
    assert(e.getMessage.contains("transpose"), e.getMessage)
  }

  test("pivotStrict raises on duplicate (index, column) pairs") {
    import graft.operators.ReshapeOps
    val ok = Seq((1, "a", 10L), (1, "b", 20L), (2, "a", 30L))
      .toDF("k", "c", "v")
    val wide = ReshapeOps.pivotStrict(ok, Seq("k"), "c", "v", Seq("a", "b"))
    assert(wide.count() == 2 && wide.columns.toSeq == Seq("k", "a", "b"))
    val dup = ok.union(Seq((1, "a", 99L)).toDF("k", "c", "v"))
    intercept[IllegalArgumentException] {
      ReshapeOps.pivotStrict(dup, Seq("k"), "c", "v", Seq("a", "b"))
    }
  }

  test("StrOps.wrap: lines fit width, long words unbroken, text preserved") {
    import graft.functions.StrOps
    import org.apache.spark.sql.functions.{col, split}
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "supercalifragilisticexpialidocious yes",
      "one", "", "a b")
    val out = texts.toDF("t").withColumn("w", split(col("t"), " "))
      .select(StrOps.wrap(col("w"), 10)).collect().map(_.getString(0))
    texts.zip(out).foreach { case (orig, wrapped) =>
      assert(wrapped.replace("\n", " ") == orig, s"content changed: $orig")
      wrapped.split("\n").foreach { line =>
        assert(line.length <= 10 || !line.contains(" "),
          s"overlong multi-word line '$line'")
      }
    }
  }

  test("StrOps.normalizeUnicode: NFC composes, NFKC folds compatibility") {
    import graft.functions.StrOps
    import org.apache.spark.sql.functions.col
    val rows = Seq("éclair", "ﬁne", null).toDF("s")
      .select(StrOps.normalizeUnicode(col("s"), "NFC").as("nfc"),
        StrOps.normalizeUnicode(col("s"), "NFKC").as("nfkc"))
      .collect()
    assert(rows(0).getString(0) == "éclair")      // e+combining → é
    assert(rows(1).getString(1) == "fine")             // ﬁ ligature folds
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1)) // null propagates
  }
}

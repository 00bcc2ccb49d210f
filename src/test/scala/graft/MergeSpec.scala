package graft

import graft.operators.MergeOps
import org.apache.spark.sql.functions._

/** MergeOps fixture contracts the differential gates can't reach:
  * column-level merge coalesce semantics, CDC same-instant tie-break,
  * SCD2 out-of-order rejection. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("upsert replaces matched rows, inserts new, keeps the rest") {
    val src = Seq((2L, "B", 99.0), (9L, "z", 1.0)).toDF("k", "name", "bal")
    val out = MergeOps.upsert(target, src, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out === Map(1L -> ("a", 10.0), 2L -> ("B", 99.0),
      3L -> ("c", 30.0), 9L -> ("z", 1.0)))
  }

  test("mergeUpdate touches only updateCols on match; inserts take " +
    "source values; source NULL falls back to target") {
    val src = Seq[(Long, String, java.lang.Double)](
      (2L, null, 99.0),  // match: bal updated, name kept (null falls back)
      (9L, "z", 1.0)     // insert: all source values
    ).toDF("k", "name", "bal")
    val out = MergeOps.mergeUpdate(target, src, Seq("k"), Seq("bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out === Map(1L -> ("a", 10.0), 2L -> ("b", 99.0),
      3L -> ("c", 30.0), 9L -> ("z", 1.0)))
  }

  test("mergeUpdate keeps a matched target's legitimate NULL in " +
    "non-update columns (no coalesce overwrite)") {
    val t = Seq[(Long, String, java.lang.Double)]((2L, null, 20.0))
      .toDF("k", "name", "bal")
    val src = Seq((2L, "X", 99.0)).toDF("k", "name", "bal")
    val out = MergeOps.mergeUpdate(t, src, Seq("k"), Seq("bal"))
      .collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(1), "matched target NULL was overwritten")
    assert(out(0).getDouble(2) === 99.0)
  }

  test("upsert(validate = true) rejects an uncompacted changeset") {
    val src = Seq((2L, "v1", 1.0), (2L, "v2", 2.0)).toDF("k", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      MergeOps.upsert(target, src, Seq("k"), validate = true)
    }
    assert(e.getMessage.contains("multiple rows"))
    // default trusts the caller (documented precondition)
    assert(MergeOps.upsert(target, src, Seq("k")).count() === 4)
  }

  test("applyChanges: latest-wins per key, same-seq tie favors the " +
    "delete, deletes drop keys, new keys insert") {
    val ch = Seq(
      (1L, "a1", 11.0, "U", 5L),
      (1L, "a2", 12.0, "U", 7L),   // latest for k=1
      (2L, "bX", 0.0, "D", 9L),    // delete k=2
      (3L, "c1", 31.0, "U", 4L),
      (3L, "cD", 0.0, "D", 4L),    // same seq: delete wins
      (9L, "z", 1.0, "U", 1L)      // insert
    ).toDF("k", "name", "bal", "op", "seq")
    val out = MergeOps.applyChanges(target, ch, Seq("k"), "op", "seq")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out === Map(1L -> ("a2", 12.0), 9L -> ("z", 1.0)))
  }

  test("applyChanges requires every target column in the change feed") {
    val bad = Seq((1L, "x", "U", 1L)).toDF("k", "name", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeOps.applyChanges(target, bad, Seq("k"), "op", "seq")
    }
    assert(e.getMessage.contains("bal"))
  }

  test("mergeAggState folds deltas exactly: new keys insert, untouched " +
    "keys persist, schema mismatch rejected") {
    val state = Seq((1L, 2L, BigDecimal("10.50")), (2L, 1L, BigDecimal("5.00")))
      .toDF("k", "cnt", "v")
    val delta = Seq((1L, BigDecimal("1.25")), (1L, BigDecimal("2.25")),
      (9L, BigDecimal("7.00"))).toDF("k", "v")
    val out = MergeOps.mergeAggState(state, delta, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(out === Map(1L -> (4L, 14.0), 2L -> (1L, 5.0), 9L -> (1L, 7.0)))
    // empty delta: state unchanged
    val same = MergeOps.mergeAggState(state, delta.limit(0), Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(same === Map(1L -> (2L, 10.5), 2L -> (1L, 5.0)))
    val e = intercept[IllegalArgumentException] {
      MergeOps.mergeAggState(state.drop("cnt"), delta, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("state columns"))
  }

  test("scd2Apply chains versions and rejects out-of-order updates") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .withColumn("valid_from", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val upd = Seq(
      (1L, "a1", "2020-02-01 00:00:00"),
      (1L, "a2", "2020-03-01 00:00:00")
    ).toDF("k", "name", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = MergeOps.scd2Apply(dim, upd, "k", "ts", Seq("name"))
      .select(col("k"), col("name"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("f"),
        coalesce(date_format(col("valid_to"), "yyyy-MM-dd"), lit("open"))
          .as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    assert(out === Set(
      (1L, "a", "2020-01-01", "2020-02-01"),
      (1L, "a1", "2020-02-01", "2020-03-01"),
      (1L, "a2", "2020-03-01", "open"),
      (2L, "b", "2020-01-01", "open")))

    val bad = Seq((1L, "a0", "2019-06-01 00:00:00"))
      .toDF("k", "name", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val e = intercept[Exception] {
      MergeOps.scd2Apply(dim, bad, "k", "ts", Seq("name")).collect()
    }
    assert(e.getMessage != null)
  }
}

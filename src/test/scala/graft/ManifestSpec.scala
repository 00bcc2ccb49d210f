package graft

import graft.sources.Manifest
import org.apache.spark.sql.functions._

/** Footer manifest: stats match the data they index, pruning keeps
  * exactly the intersecting files, NULL-stat columns stay visible,
  * empty slices return empty (never throw). */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-${ProcessHandle.current().pid()}").toString
    spark.range(1000)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"),
        when(pmod(col("id"), lit(10)) === 0, lit(null))
          .otherwise(col("id") * 2).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("per-file min/max/nulls/rows match the data") {
    // key by basename: input_file_name() spells the scheme as
    // file:/// while Hadoop Path.toString uses file:/
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val mf = Manifest.build(spark, dir, Seq("k", "v")).collect()
      .map(r => (base(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toMap
    val actual = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"), min("k").as("mnk"), max("k").as("mxk"),
        sum(col("v").isNull.cast("long")).as("nv"),
        min("v").as("mnv"), max("v").as("mxv"))
      .collect()
    assert(actual.length === 4)
    actual.foreach { r =>
      val f = base(r.getString(0))
      val (rows, nulls, mn, mx) = mf((f, "k"))
      assert(rows === r.getLong(1) && nulls === 0L)
      assert(mn.get === r.getLong(2) && mx.get === r.getLong(3), f)
      val (vr, vn, vmn, vmx) = mf((f, "v"))
      assert(vr === r.getLong(1) && vn === r.getLong(4))
      assert(vmn.get === r.getLong(5) && vmx.get === r.getLong(6), f)
    }
  }

  test("pruning reads exactly the intersecting files; misses return " +
    "empty; string columns surface NULL stats") {
    val mf = Manifest.build(spark, dir, Seq("k", "s"))
    // range inside one quarter of the range-partitioned layout
    val one = Manifest.prunedRead(spark, mf, "k", 10, 20)
    assert(one.select(input_file_name()).distinct().count() === 1)
    assert(one.count() === 11)
    // out-of-range: empty result, correct schema, no throw
    val none = Manifest.prunedRead(spark, mf, "k", 5000, 6000)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "s", "v"))
    // string column: visible in the manifest with NULL min/max —
    // and a pruned read over it keeps every file (conservative)
    val sRows = mf.filter(col("column") === "s").collect()
    assert(sRows.length === 4 && sRows.forall(r => r.isNullAt(4)))
  }
}

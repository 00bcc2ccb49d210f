package graft

import graft.sources.Manifest
import org.apache.spark.sql.functions._

/** A LocalFileSystem under a custom scheme that ONLY resolves when the
  * job's Hadoop conf (which maps fs.graftest.impl to this class)
  * reaches the executor-side footer reads — a default Configuration
  * has no such mapping and fails with "No FileSystem for scheme". */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftest"
  override def getUri: java.net.URI = java.net.URI.create("graftest:///")
}

/** Footer manifest: stats match the data they index, pruning keeps
  * exactly the intersecting files, NULL-stat columns stay visible,
  * empty slices return empty (never throw), string/double stats prune
  * their own key types, and executor reads honor the job Hadoop conf. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-manifest-${ProcessHandle.current().pid()}").toString
    spark.range(1000)
      .select(col("id").as("k"),
        // zero-padded so byte order == numeric order (the string key)
        concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"),
        (col("id") * 0.5d).as("d"),
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
    "empty") {
    val mf = Manifest.build(spark, dir, Seq("k", "s"))
    // range inside one quarter of the range-partitioned layout
    val one = Manifest.prunedRead(spark, mf, "k", 10, 20)
    assert(one.select(input_file_name()).distinct().count() === 1)
    assert(one.count() === 11)
    // out-of-range: empty result, correct schema, no throw
    val none = Manifest.prunedRead(spark, mf, "k", 5000, 6000)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "s", "d", "v"))
  }

  test("string and double stats populate and prune their key types") {
    val mf = Manifest.build(spark, dir, Seq("s", "d")).cache()
    val sRows = mf.filter(col("column") === "s").collect()
    assert(sRows.length === 4)
    // string stats live in min_s/max_s (cols 8/9); typed slots null
    sRows.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(6), "long/double slots must be null")
      assert(r.getString(8) < r.getString(9))
    }
    // string-range pruning: s0010..s0020 is inside one of 4 files
    val one = Manifest.prunedReadString(spark, mf, "s", "s0010", "s0020")
    assert(one.inputFiles.length === 1)
    assert(one.count() === 11)
    val noneS = Manifest.prunedReadString(spark, mf, "s", "t", "u")
    assert(noneS.inputFiles.length === 0 || noneS.count() === 0)
    // double-range pruning: d = id * 0.5, so [5.0, 10.0] = ids 10..20
    val oneD = Manifest.prunedReadDouble(spark, mf, "d", 5.0, 10.0)
    assert(oneD.inputFiles.length === 1)
    assert(oneD.count() === 11)
    mf.unpersist()
  }

  test("string truncation keeps bounds valid: lower truncates, upper " +
    "increments") {
    val cap = Manifest.StringStatCap
    val longLo = "a" * (cap + 10)
    val longHi = "b" * (cap + 10)
    assert(Manifest.truncLower(longLo) === "a" * cap)
    assert(Manifest.truncLower(longLo) <= longLo) // valid lower bound
    val up = Manifest.truncUpper(longHi).get
    assert(up.length <= cap && up > longHi) // valid upper bound
    // all-max prefix: no valid increment — poison (None)
    assert(Manifest.truncUpper("￿" * (cap + 1)).isEmpty)
    // short strings pass through both untouched
    assert(Manifest.truncLower("abc") === "abc")
    assert(Manifest.truncUpper("abc") === Some("abc"))
  }

  test("executor footer reads use the JOB Hadoop conf, not a default " +
    "Configuration") {
    val hc = spark.sparkContext.hadoopConfiguration
    // register a custom scheme in the JOB conf only, cache disabled so
    // the driver's directory listing cannot pre-populate the shared
    // FileSystem cache and mask a default-Configuration regression
    hc.set("fs.graftest.impl", classOf[GraftTestFs].getName)
    hc.setBoolean("fs.graftest.impl.disable.cache", true)
    try {
      val mf = Manifest.build(spark, "graftest://" + dir, Seq("k"))
      // footer opens happened on executors under graftest:// — only
      // possible if the broadcast job conf reached them
      assert(mf.count() === 4)
      assert(mf.agg(sum("rows")).collect()(0).getLong(0) === 1000L)
    } finally {
      hc.unset("fs.graftest.impl")
      hc.unset("fs.graftest.impl.disable.cache")
    }
  }
}

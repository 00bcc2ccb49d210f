package graft

import graft.operators.DistScan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistScan (distributed global-order scans) must be bit-identical to
  * the single-partition global window on exact (decimal/long) values —
  * the bucket cut changes where prefixes are split, never their sums. */
class DistScanSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int) = {
    val rnd = new scala.util.Random(7)
    (1 to n).map { i =>
      // non-unique leading key with heavy ties to exercise tie bucketing
      (rnd.nextInt(n / 10), i, BigDecimal(rnd.nextInt(10000)) / 100)
    }.toDF("k", "id", "v").withColumn("v", col("v").cast("decimal(12,2)"))
  }

  test("withRunningSums equals single-partition cumsum (decimal + count)") {
    val df = frame(2000)
    val ord = Seq(col("k"), col("id"))
    val dist = DistScan.dropBuckets(
      DistScan.withRunningSums(df, col("k"), ord,
        Seq("cum" -> col("v"), "rn" -> lit(1L)), buckets = 8))
      .select(col("id"), col("cum").cast("string"), col("rn").cast("long"))
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = df.select(col("id"),
      sum(col("v")).over(w).cast("string"), count(lit(1)).over(w))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("withGroupedRunningSum equals per-group global cumsum, with a " +
      "hot group spanning buckets; row-grained keys rejected") {
    val rnd = new scala.util.Random(11)
    // 60% of rows in ONE group (the skew the op exists for), long sums
    val df = (1 to 3000).map { i =>
      val g = if (rnd.nextInt(10) < 6) "hot" else s"g${rnd.nextInt(7)}"
      (g, i, rnd.nextInt(1000).toLong)
    }.toDF("g", "id", "v")
    val ord = Seq(col("k").asc, col("id").asc)
    val withK = df.withColumn("k", pmod(xxhash64(col("id")), lit(1000)))
    val dist = DistScan.withGroupedRunningSum(withK, Seq("g"), col("k"),
        ord, "cum", col("v"), buckets = 8)
      .select(col("id"), col("cum"))
    val w = Window.partitionBy(col("g")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = withK.select(col("id"), sum(col("v")).over(w).as("cum"))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
    // loud guard: a per-row group key must be rejected, not broadcast
    val e = intercept[IllegalArgumentException] {
      DistScan.withGroupedRunningSum(withK, Seq("id"), col("k"), ord,
        "cum", col("v"), buckets = 8, maxGroups = 100)
    }
    assert(e.getMessage.contains("row-grained"), e.getMessage)
  }

  test("withContext lag equals global lag across bucket boundaries") {
    val df = frame(2000)
    val ord = Seq(col("k"), col("id"))
    val bucketed = DistScan.bucketed(df, col("k"), 8)
    val ctx = DistScan.withContext(bucketed, ord, 25)
    val dist = DistScan.dropContext(
      ctx.withColumn("lv", lag(col("v"), 25).over(DistScan.windowSpec(ord))))
      .select("id", "lv")
    val global = df.select(col("id"),
      lag(col("v"), 25).over(Window.orderBy(ord: _*)).as("lv"))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("physically identical duplicate rows: rn-totalized lag matches global") {
    // double every 7th row so no key-derived order is total
    val base = frame(1400)
    val df = base.unionAll(base.filter(col("id") % 7 === 0))
    val ord = Seq(col("k"), col("id"))
    val scanned = DistScan.withRunningSums(df, col("k"), ord,
      Seq("cum" -> col("v"), "rn" -> lit(1L)), buckets = 8)
    val ctx = DistScan.withContext(scanned, Seq(col("rn")), 25)
    val dist = DistScan.dropContext(
      ctx.withColumn("lv", lag(col("cum"), 25).over(DistScan.windowSpec(Seq(col("rn"))))))
      .select(col("id"), col("lv").cast("string"))
    val w = Window.orderBy(ord: _*)
    val global = df
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), lag(col("cum"), 25).over(w).cast("string").as("lv"))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("centRollingSum equals single-partition rolling window, with dup rows") {
    val base = frame(1400)
    val df = base.unionAll(base.filter(col("id") % 7 === 0))
      .withColumn("c", (col("v") * 100).cast("long"))
    val ord = Seq(col("k"), col("id"))
    val dist = DistScan.centRollingSum(df, ord, col("c"), n = 25, buckets = 8)
      .select(col("id"), col("roll_sum_cents"), col("rn"))
    val w = Window.orderBy(ord: _*)
    val global = df
      .withColumn("roll_sum_cents",
        sum(col("c")).over(w.rowsBetween(-24, 0)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("id"), col("roll_sum_cents"), col("rn"))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("withGlobalRowNumber equals global row_number incl. desc + nulls") {
    val df = frame(2000).withColumn("kn",
      when(col("k") % 5 === 0, lit(null)).otherwise(col("k")))
    val ord = Seq(col("kn").desc_nulls_first, col("id").asc)
    val (dist, total) = DistScan.withGlobalRowNumber(df, ord, "pos", buckets = 8)
    val global = df.withColumn("pos",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
    assert(total == 2000)
    assert(dist.select("id", "pos").exceptAll(global.select("id", "pos")).isEmpty)
  }

  test("globalNtile equals global ntile") {
    val df = frame(2003)
    val ord = Seq(col("v").asc, col("id").asc)
    val dist = DistScan.globalNtile(df, ord, 4, "bucket", buckets = 8)
      .select("id", "bucket")
    val global = df.select(col("id"),
      ntile(4).over(Window.orderBy(ord: _*)).as("bucket"))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("withGlobalFfill equals single-partition last-ignoreNulls window") {
    val df = frame(2000).withColumn("a",
      when(col("id") % 3 === 0, col("v")).otherwise(lit(null)))
      .withColumn("s",
        when(col("id") % 17 === 0, concat(lit("x"), col("id"))).otherwise(lit(null)))
    val ord = Seq(col("k"), col("id"))
    val dist = DistScan.withGlobalFfill(df, col("k"), ord, Seq("a", "s"), buckets = 8)
      .select(col("id"), col("a").cast("string"), col("s"))
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = df.select(col("id"),
      last(col("a"), ignoreNulls = true).over(w).cast("string"),
      last(col("s"), ignoreNulls = true).over(w))
    assert(dist.exceptAll(global).isEmpty && global.exceptAll(dist).isEmpty)
  }

  test("every bucket holds enough rows for the context window") {
    val df = frame(2000)
    val counts = DistScan.bucketed(df, col("k"), 8)
      .groupBy(DistScan.PidCol).count().collect().map(_.getLong(1))
    assert(counts.forall(_ >= 25), s"bucket sizes: ${counts.mkString(",")}")
  }
}

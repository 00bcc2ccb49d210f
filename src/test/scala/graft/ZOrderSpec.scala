package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-key correctness against a bit-twiddling
  * reference, and the data-skipping property itself — per-file min/max
  * spread on BOTH dimensions vs a linear sort's one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleaveBits matches a bit-twiddling reference on the grid") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val df = pts.toDF("x", "y")
      .withColumn("z", ZOrder.interleaveBits(Seq(col("x"), col("y")), 4))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 4), s"($x,$y)")
    }
  }

  test("normalizeToGrid clamps, nulls to origin, degenerate to zero") {
    val df = Seq[(java.lang.Long, String)](
      (0L, "lo"), (100L, "hi"), (50L, "mid"), (null, "null"),
      (-5L, "below"), (200L, "above")).toDF("v", "tag")
      .withColumn("cell", ZOrder.normalizeToGrid(col("v"), 0, 100, 8))
      .withColumn("degen", ZOrder.normalizeToGrid(col("v"), 7, 7, 8))
    val m = df.collect().map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(m("lo")._1 === 0L)
    assert(m("hi")._1 === 255L)
    assert(m("mid")._1 === (50L * 255 / 100))
    assert(m("null")._1 === 0L)
    assert(m("below")._1 === 0L)   // clamped
    assert(m("above")._1 === 255L) // clamped
    assert(m("mid")._2 === 0L)     // degenerate range
  }

  test("z-ordered files bound the spread of BOTH dims; linear sort " +
    "leaves the second dim at full range") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-zorder-spec-${ProcessHandle.current().pid()}")
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"),
        pmod(col("id"), lit(256L)).as("y"))

    // z-ordered: 16 files ≈ 4 key prefix bits ≈ 64x64 cells
    val z = ZOrder.writeZOrdered(grid, s"$dir/z", Seq("x", "y"),
      bits = 8, nFiles = 16)
    def spreads(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx").as("ax"), avg("sy").as("ay")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = spreads(z)

    // linear sort on x: same cost, perfect on x, useless on y
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/lin")
    val (_, ly) = spreads(spark.read.parquet(s"$dir/lin"))

    // range-partition boundaries are sampled, so allow ~2 cells of
    // slack over the ideal 63; linear keeps y at the full 255
    assert(zx <= 128, s"z-order x spread too wide: $zx")
    assert(zy <= 128, s"z-order y spread too wide: $zy")
    assert(ly >= 250, s"linear layout unexpectedly bounded y: $ly")
    assert(zy < ly / 1.8, s"z-order y spread $zy not < linear $ly / 1.8")
  }

  test("rewrite preserves the row set exactly") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-zorder-rt-${ProcessHandle.current().pid()}")
    val in = spark.range(1000)
      .select(col("id").as("a"), pmod(col("id") * 37, lit(101)).as("b"),
        concat(lit("r"), col("id")).as("s"))
    val back = ZOrder.writeZOrdered(in, dir.toString, Seq("a", "b"),
      bits = 12, nFiles = 4)
    assertFrameEqual(back, in)
  }
}

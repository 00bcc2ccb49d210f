package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q1_agg decomposition (guide §1): is the time in the scan, the
  * decimal aggregates, or the fixed stage costs? */
object MicroQ1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Q
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[microq1] $name: median ${ts.sorted.apply(1)}%.3f " +
        s"(${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    val filt = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val grp = Seq(col("l_returnflag"), col("l_linestatus"))

    time("scan only (all q1 cols)") {
      filt.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
    }
    time("double sums (inexact)") {
      filt.groupBy(grp: _*).agg(
        sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))),
        avg(col("l_quantity")), avg(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1)))
    }
    time("long-cents sums (exact, narrow)") {
      val qc = (col("l_quantity") * 100).cast("long")
      val pc = (col("l_extendedprice") * 100).cast("long")
      val dc = (col("l_discount") * 100).cast("long")
      val tc = (col("l_tax") * 100).cast("long")
      filt.groupBy(grp: _*).agg(
        sum(qc), sum(pc), sum(pc * (lit(100L) - dc)),
        sum(pc * (lit(100L) - dc) * (lit(100L) + tc)),
        count(lit(1)))
    }
    time("current q1 (decimal-exact)") {
      graft.queries.CoreQueries.q1(spark, sfDir)
    }
    time("q1 without orderBy") {
      filt.groupBy(grp: _*).agg(
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(Q.dec2(col("l_extendedprice")) * (lit(1) - Q.dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(Q.dec2(col("l_extendedprice")) * (lit(1) - Q.dec2(col("l_discount")))
          * (lit(1) + Q.dec2(col("l_tax")))).cast("double").as("sum_charge"),
        Q.davg(col("l_quantity")).as("avg_qty"),
        Q.davg(col("l_extendedprice")).as("avg_price"),
        Q.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    }
    spark.stop()
  }
}

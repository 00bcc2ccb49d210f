package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** q1 candidate rewrites: exact long-cents per row + decimal recombine
  * per group. Checks both speed AND bit-identity of every output column
  * against the current decimal-exact q1. */
object MicroQ1b {
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
    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[microq1b] $name: median ${ts.sorted.apply(1)}%.3f " +
        s"(${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    def filt = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val grp = Seq(col("l_returnflag"), col("l_linestatus"))
    // exact cents from a true-2-decimal double: v*100 is within 1e-8 of
    // the true integer, so +0.5-then-truncate recovers it exactly
    // (positive values)
    def cents(c: org.apache.spark.sql.Column) =
      (c * 100d + 0.5d).cast("long")

    def candidate: DataFrame = {
      val qc = cents(col("l_quantity"))
      val pc = cents(col("l_extendedprice"))
      val dc = cents(col("l_discount"))
      val tc = cents(col("l_tax"))
      val d38 = DecimalType(38, 0)
      filt.groupBy(grp: _*).agg(
          sum(qc.cast(d38)).as("sq"),
          sum(pc.cast(d38)).as("sp"),
          sum((pc * (lit(100L) - dc)).cast(d38)).as("sd"),
          sum((pc * (lit(100L) - dc) * (lit(100L) + tc)).cast(d38)).as("sc"),
          sum(dc.cast(d38)).as("sdisc"),
          count(col("l_quantity")).as("nq"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("sq") / lit(100)).cast(DoubleType).as("sum_qty"),
          (col("sp") / lit(100)).cast(DoubleType).as("sum_base_price"),
          (col("sd") / lit(10000)).cast(DoubleType).as("sum_disc_price"),
          (col("sc") / lit(1000000)).cast(DoubleType).as("sum_charge"),
          ((col("sq") / lit(100)).cast(DoubleType) / col("nq")).as("avg_qty"),
          ((col("sp") / lit(100)).cast(DoubleType) / col("nq")).as("avg_price"),
          ((col("sdisc") / lit(100)).cast(DoubleType) / col("nq")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    def candidateHiLo: DataFrame = {
      val qc = cents(col("l_quantity"))
      val pc = cents(col("l_extendedprice"))
      val dc = cents(col("l_discount"))
      val tc = cents(col("l_tax"))
      val M = 1000000000L // 1e9 split base
      def hilo(x: org.apache.spark.sql.Column, name: String) = Seq(
        sum((x / M).cast("long")).as(s"${name}_hi"),
        sum(pmod(x, lit(M))).as(s"${name}_lo"))
      val d38 = DecimalType(38, 0)
      def rec(name: String) =
        (col(s"${name}_hi").cast(d38) * lit(M) + col(s"${name}_lo").cast(d38))
      filt.groupBy(grp: _*).agg(
          (hilo(qc, "sq") ++ hilo(pc, "sp") ++
            hilo(pc * (lit(100L) - dc), "sd") ++
            hilo(pc * (lit(100L) - dc) * (lit(100L) + tc), "sc") ++
            hilo(dc, "sdisc") :+
            count(col("l_quantity")).as("nq") :+
            count(lit(1)).as("count_order")).head,
          (hilo(qc, "sq").tail ++ hilo(pc, "sp") ++
            hilo(pc * (lit(100L) - dc), "sd") ++
            hilo(pc * (lit(100L) - dc) * (lit(100L) + tc), "sc") ++
            hilo(dc, "sdisc") :+
            count(col("l_quantity")).as("nq") :+
            count(lit(1)).as("count_order")): _*)
        .select(col("l_returnflag"), col("l_linestatus"),
          (rec("sq") / lit(100)).cast(DoubleType).as("sum_qty"),
          (rec("sp") / lit(100)).cast(DoubleType).as("sum_base_price"),
          (rec("sd") / lit(10000)).cast(DoubleType).as("sum_disc_price"),
          (rec("sc") / lit(1000000)).cast(DoubleType).as("sum_charge"),
          ((rec("sq") / lit(100)).cast(DoubleType) / col("nq")).as("avg_qty"),
          ((rec("sp") / lit(100)).cast(DoubleType) / col("nq")).as("avg_price"),
          ((rec("sdisc") / lit(100)).cast(DoubleType) / col("nq")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    val cur = graft.queries.CoreQueries.q1(spark, sfDir).collect()
    def diff(name: String, got: Array[org.apache.spark.sql.Row]): Unit = {
      val same = cur.length == got.length && cur.zip(got).forall {
        case (a, b) => (0 until a.length).forall { i =>
          val x = a.get(i); val y = b.get(i)
          (x, y) match {
            case (xd: Double, yd: Double) =>
              java.lang.Double.doubleToLongBits(xd) ==
                java.lang.Double.doubleToLongBits(yd)
            case _ => x == y
          }
        }
      }
      System.err.println(s"[microq1b] $name bit-identical to current: $same")
      if (!same) {
        cur.zip(got).filterNot { case (a, b) => a == b }.take(3)
          .foreach { case (a, b) =>
            System.err.println(s"  cur: $a"); System.err.println(s"  got: $b") }
      }
    }
    diff("dec38-sum candidate", candidate.collect())
    diff("hilo candidate", candidateHiLo.collect())
    time("current q1")(graft.queries.CoreQueries.q1(spark, sfDir))
    time("dec38-sum candidate")(candidate)
    time("hilo candidate")(candidateHiLo)
    spark.stop()
  }
}

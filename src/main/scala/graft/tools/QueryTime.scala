package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round scratch harness: noop-sink timing (1 warmup +
  * 3 reps) for named registry queries under the Bench session shape.
  * Not part of the driver contract.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.Bench.headline
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
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      val f = queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = (1 to 3).map(_ => once())
      System.err.println(f"[qtime] $n: median ${ts.sorted.apply(1)}%.3f " +
        s"reps ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

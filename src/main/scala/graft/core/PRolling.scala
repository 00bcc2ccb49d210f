package graft.core

import graft.functions.EwmAggregator
import graft.operators.RollingOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deferred rolling view (reference: pandas/core/window.py:48 Rolling):
  * created by `PFrame.rolling` / `PGroupBy.rolling`, aggregates realize
  * as window functions over (keys, order) — one shuffle on the keys.
  */
final case class PRolling(frame: PFrame, keys: Seq[String], n: Int,
    minPeriods: Int = 1) {

  private def spec = {
    val o = frame.withOrder
    (o, RollingOps.fixed(keys, Seq(col(o.orderCol.get)), n))
  }

  private def guarded(c: Column, agg: Column): Column = {
    val (_, w) = spec
    RollingOps.withMinPeriods(agg, c, w, minPeriods)
  }

  def sum(c: String, as: String): PFrame = {
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as, guarded(col(c), sum_(col(c)).over(w))))
  }

  def mean(c: String, as: String): PFrame = {
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as,
      guarded(col(c), sum_(col(c)).over(w) /
        org.apache.spark.sql.functions.count(col(c)).over(w))))
  }

  def min(c: String, as: String): PFrame = {
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as, guarded(col(c),
      org.apache.spark.sql.functions.min(col(c)).over(w))))
  }

  def max(c: String, as: String): PFrame = {
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as, guarded(col(c),
      org.apache.spark.sql.functions.max(col(c)).over(w))))
  }

  def count(c: String, as: String): PFrame = {
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as,
      org.apache.spark.sql.functions.count(col(c)).over(w)))
  }

  /** rolling(n, win_type=...).mean() (reference pandas/core/window.py:434
    * Window): weighted mean over the full n-row frame with driver-
    * computed scipy-compatible weights (WindowWeights) — null until the
    * frame holds all n rows, matching pandas' min_periods=window for
    * weighted windows. Parameterized types take their scipy kwarg. */
  def weightedMean(c: String, as: String, winType: String,
      param: Double = Double.NaN): PFrame = {
    import graft.operators.WindowWeights
    val weights = winType match {
      case "boxcar" => WindowWeights.boxcar(n)
      case "triang" => WindowWeights.triang(n)
      case "bartlett" => WindowWeights.bartlett(n)
      case "hamming" => WindowWeights.hamming(n)
      case "blackman" => WindowWeights.blackman(n)
      case "gaussian" => WindowWeights.gaussian(n, param)
      case "kaiser" => WindowWeights.kaiser(n, param)
      case "exponential" => WindowWeights.exponential(n, param)
      case other => throw new IllegalArgumentException(s"unknown win_type: $other")
    }
    val (o, w) = spec
    o.copy(df = o.df.withColumn(as,
      WindowWeights.weightedMean(col(c), w, weights)))
  }

  private def sum_(c: Column) = org.apache.spark.sql.functions.sum(c)
}

/** Deferred resampler (reference: pandas/core/resample.py:38): tumbling
  * time buckets realized as groupBy(window(ts, width)). */
final case class PResampler(frame: PFrame, tsCol: String, width: String,
    keys: Seq[String]) {

  def agg(exprs: (String, Column)*): PFrame = {
    // Grouper.bucket unifies the rule spelling: plain durations
    // ('5 minutes' / pandas '5min') bucket by window().start; anchored
    // rules ('W-SUN', 'Q-NOV', 'A-JUN', 'M', 'MS') by their Offsets
    // label — same single-shuffle hash-agg plan either way.
    val grouped = frame.df.groupBy(
      (keys.map(col) :+ Grouper.bucket(col(tsCol), width).as("bucket")): _*)
    val out = grouped.agg(exprs.head._2.as(exprs.head._1),
      exprs.tail.map { case (n, e) => e.as(n) }: _*)
      .select((keys.map(col) :+ col("bucket")) ++ exprs.map(e => col(e._1)): _*)
    PFrame(out, keys :+ "bucket", None)
  }

  def count(): PFrame = agg("count" -> org.apache.spark.sql.functions.count(lit(1)))
  def sum(c: String): PFrame = agg(s"sum_$c" -> org.apache.spark.sql.functions.sum(col(c)))
  def mean(c: String): PFrame = agg(s"mean_$c" -> avg(col(c)))
}

/** Deferred EWM view (reference: pandas/core/generic.py:9755 ewm):
  * adjust=false mean through the typed EwmAggregator (positions come
  * from the frame's order column). */
final case class PEwm(frame: PFrame, keys: Seq[String], alpha: Double) {
  def mean(c: String, as: String): PFrame = {
    val o = frame.withOrder
    val ewm = udaf(new EwmAggregator(alpha))
    val keyCols = if (keys.isEmpty) Seq(lit(1).as("__g")) else keys.map(col)
    val keyNames = if (keys.isEmpty) Seq("__g") else keys
    val aggd = o.df.select(keyCols :+ col(o.orderCol.get) :+ col(c): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(ewm(col(o.orderCol.get), col(c)).as(as))
    PFrame(if (keys.isEmpty) aggd.drop("__g") else aggd, keys, None)
  }
}

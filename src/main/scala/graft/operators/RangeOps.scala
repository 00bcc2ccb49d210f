package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-index constructors (SURVEY §2.11; reference:
  * pandas/core/indexes/datetimes.py:1375 date_range,
  * timedeltas.py:660 timedelta_range, period.py:996 period_range,
  * interval.py:1091 interval_range, datetimes.py:1474 bdate_range).
  *
  * All are `sequence()` + `explode` over a 1-row seed — generated
  * distributively by Spark's sequence expression, no driver loop. A
  * timedelta is represented as BIGINT microseconds (the engine's
  * duration convention), a period as its start timestamp + label, an
  * interval as (left, right) bounds.
  */
object RangeOps {

  def dateRange(spark: SparkSession, start: String, end: String,
      freq: String = "interval 1 day"): DataFrame =
    spark.range(1).select(explode(sequence(
      lit(start).cast("timestamp"), lit(end).cast("timestamp"),
      expr(freq))).as("ts"))

  /** bdate_range: date_range minus weekends. */
  def bdateRange(spark: SparkSession, start: String, end: String): DataFrame =
    dateRange(spark, start, end).filter(!dayofweek(col("ts")).isin(1, 7))

  /** timedelta_range as BIGINT micros: start + k·freq, k in [0, periods). */
  def timedeltaRange(spark: SparkSession, startMicros: Long, freqMicros: Long,
      periods: Int): DataFrame = {
    require(periods >= 1 && freqMicros > 0,
      s"timedelta_range needs periods >= 1 and a positive freq " +
        s"(got periods=$periods, freq=$freqMicros)")
    spark.range(1).select(explode(sequence(
      lit(startMicros), lit(startMicros + (periods - 1).toLong * freqMicros),
      lit(freqMicros))).as("td_us"))
  }

  /** period_range(freq='M'|'D'...): period start + formatted label. */
  def periodRange(spark: SparkSession, start: String, end: String,
      freq: String, label: String): DataFrame =
    spark.range(1).select(explode(sequence(
      lit(start).cast("timestamp"), lit(end).cast("timestamp"),
      expr(freq))).as("period_start"))
      .withColumn("period", date_format(col("period_start"), label))

  /** interval_range: half-open numeric bins [left, right). The bin
    * count rounds the FP quotient ((0.3-0)/0.1 = 2.9999…96 must mean 3
    * bins, not a truncated 2), and a span smaller than one step is an
    * argument error rather than a runtime sequence failure. */
  def intervalRange(spark: SparkSession, start: Double, end: Double,
      step: Double): DataFrame = {
    require(step > 0 && end > start,
      s"interval_range needs end > start and step > 0 (got [$start, $end) by $step)")
    val bins = math.round((end - start) / step)
    require(bins >= 1, s"interval_range span smaller than one step")
    spark.range(1).select(explode(sequence(
      lit(0L), lit(bins - 1), lit(1L))).as("k"))
      .select((lit(start) + col("k") * step).as("left"),
        (lit(start) + (col("k") + 1) * step).as("right"))
  }
}

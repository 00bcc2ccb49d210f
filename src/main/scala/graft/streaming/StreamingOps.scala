package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming lift of the batch operator set (SURVEY §2.10:
  * the reference is batch-only; streaming is a new capability, compiled
  * onto watermarked windows + keyed state).
  *
  * Each builder takes a streaming DataFrame (`readStream` source) and
  * returns a transformed streaming DataFrame; sinks/triggers are the
  * caller's. Batch DataFrames work through the same code paths (minus
  * watermarks), which is how the tests cross-check stream vs batch.
  */
object StreamingOps {

  /** resample-on-stream: tumbling-window counts/sums with late-data
    * cutoff. State is bounded by the watermark horizon. */
  def tumblingAgg(events: DataFrame, tsCol: String, width: String,
      watermark: String, valueCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("bucket"), col("cnt"), col("sum_value"))

  /** Gap-based sessionization: session_window works identically on
    * batch frames and watermarked streams (state closes once the
    * watermark passes a session's gap-extended end). */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
      watermark: Option[String], keys: Seq[String]): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src.groupBy((keys.map(col) :+ session_window(col(tsCol), gap)): _*)
      .agg(count(lit(1)).as("cnt"))
      .select((keys.map(col) :+ col("session_window.start").as("session_start")
        :+ col("cnt")): _*)
  }

  /** drop_duplicates-on-stream: exactly-once per key within the
    * watermark horizon (the streaming form of exact dedup). */
  def dedupWithWatermark(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Stream-stream interval join: the streaming face of merge_asof's
    * bounded-lookback core. Each left event matches right events of the
    * same key within [left.ts − lookback, left.ts]; watermarks on BOTH
    * sides bound the buffered state (Spark evicts right rows once the
    * watermark passes their ts + lookback). An exact streaming asof
    * (top-1 per left row) would need the downstream picker; the
    * interval join is the state-bounded primitive it composes from. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsLeft: String, tsRight: String, lookback: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(tsLeft, watermark)
    val r = right.withColumnRenamed(key, "__rk")
      .withWatermark(tsRight, watermark)
    l.join(r,
      expr(s"$key = __rk AND $tsRight BETWEEN $tsLeft - INTERVAL $lookback AND $tsLeft"))
      .drop("__rk")
  }

  // ---- keyed running state (flatMapGroupsWithState) ----

  case class Point(user_id: Long, seq: Long, value: Double)
  case class RunState(n: Long, total: Double, ewma: Double)
  case class RunOut(user_id: Long, seq: Long, cum_sum: Double, cum_n: Long, ewma: Double)

  /** Running per-key cumulative sum / count / EWM — the streaming
    * equivalent of groupby().cumsum() and ewm().mean() (adjust=false
    * recurrence: y ← (1-α)y + αx). In batch mode rows arrive unordered,
    * so callers must pre-sort per group (see ewmExactBatch); in
    * streaming mode state persists across micro-batches.
    */
  def runningState(points: Dataset[Point], alpha: Double,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[RunOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeout) {
      (uid: Long, rows: Iterator[Point], state: GroupState[RunState]) =>
        var st = state.getOption.getOrElse(RunState(0L, 0.0, Double.NaN))
        val out = rows.toSeq.sortBy(_.seq).map { p =>
          val ewma = if (st.n == 0L) p.value else (1 - alpha) * st.ewma + alpha * p.value
          st = RunState(st.n + 1, st.total + p.value, ewma)
          RunOut(uid, p.seq, st.total, st.n, ewma)
        }
        state.update(st)
        out.iterator
    }
  }

  /** Exact sequential EWM for BATCH frames (adjust=true, the pandas
    * default): per-group in-memory recurrence via flatMapGroups. The
    * partition-parallel alternative to the closed-form window expression
    * in RollingOps.ewmaAdjusted — numerically stable for arbitrarily
    * long series because the recurrence never exponentiates. */
  def ewmExactBatch(points: Dataset[Point], alpha: Double): Dataset[RunOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.user_id).flatMapGroups { (uid, rows) =>
      var num = 0.0; var den = 0.0; var n = 0L; var total = 0.0
      rows.toSeq.sortBy(_.seq).map { p =>
        num = (1 - alpha) * num + p.value
        den = (1 - alpha) * den + 1.0
        n += 1; total += p.value
        RunOut(uid, p.seq, total, n, num / den)
      }.iterator
    }
  }
}

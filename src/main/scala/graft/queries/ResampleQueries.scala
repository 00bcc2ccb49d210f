package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling as batch windows (SURVEY §2.10; reference:
  * pandas/core/resample.py:1245 TimeGrouper, :1359 _get_time_bins;
  * upsample :758 asfreq/ffill).
  *
  * Downsample = groupBy(window(ts, w)) — a hash aggregation, fully
  * parallel. Upsample = per-group grid generation (sequence + explode)
  * + left join + forward fill; the grid join shuffles on (group, hour),
  * never materializing a global calendar.
  *
  * Spark's window() buckets and DuckDB's time_bucket share the same
  * epoch-aligned boundaries for minute/hour widths.
  */
object ResampleQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    QueryDef("resample_5min",
      (s, d) => T.events(s, d)
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("bucket"), col("cnt"), col("sum_value")),
      Some(s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket,
              |  count(*) AS cnt, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    QueryDef("resample_1h_user",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), davg(col("value")).as("avg_value"))
        .select(col("user_id"), col("window.start").as("bucket"),
          col("cnt"), col("avg_value")),
      Some(s"""SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
              |  count(*) AS cnt, ${davgSql("value")} AS avg_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // resample(closed='right', label='right'): buckets are (b-5m, b]
    // labeled by their right edge — integer µs arithmetic (ceil-div)
    // identical in both engines, no FP bucket edges. origin offset:
    // pandas offset='90s' shifts the grid; same ceil-div on (t - 90s).
    QueryDef("resample_closed_right",
      (s, d) => {
        // integer `div` (truncating; all operands positive) — Column./
        // would be DOUBLE division and FP bucket edges
        val bucketR = expr(
          "timestamp_micros(((unix_micros(ts) + 299999999) div 300000000) * 300000000)")
        val bucketO = expr(
          "timestamp_micros((((unix_micros(ts) - 90000000) + 299999999) div 300000000) * 300000000 + 90000000)")
        T.events(s, d)
          .groupBy(bucketR.as("bucket_r"), bucketO.as("bucket_o"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      },
      Some(s"""SELECT make_timestamp(((epoch_us(ts) + 299999999) // 300000000) * 300000000) AS bucket_r,
              |  make_timestamp((((epoch_us(ts) - 90000000) + 299999999) // 300000000) * 300000000 + 90000000) AS bucket_o,
              |  count(*) AS cnt, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // asfreq: upsample to an hourly grid, no fill — absent hours null.
    QueryDef("asfreq_hour_grid",
      (s, d) => {
        val ev = T.events(s, d).filter(col("user_id") < 8)
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("mn"), max(col("ts")).as("mx"))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
        val hourly = ev.groupBy(col("user_id"),
            window(col("ts"), "1 hour").getField("start").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        grid.join(hourly, Seq("user_id", "hour"), "left")
      },
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
             |           FROM events WHERE user_id < 8 GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour
             |         FROM b),
             |h AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour, count(*) AS cnt
             |      FROM events WHERE user_id < 8 GROUP BY 1, 2)
             |SELECT grid.user_id, grid.hour, h.cnt
             |FROM grid LEFT JOIN h USING (user_id, hour)""".stripMargin)),

    // upsample + ffill: the grid join above, then pad forward per group.
    QueryDef("upsample_ffill",
      (s, d) => {
        val ev = T.events(s, d).filter(col("user_id") < 8)
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("mn"), max(col("ts")).as("mx"))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
        val hourly = ev.groupBy(col("user_id"),
            window(col("ts"), "1 hour").getField("start").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val joined = grid.join(hourly, Seq("user_id", "hour"), "left")
        val w = Window.partitionBy("user_id").orderBy(col("hour").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        joined.select(col("user_id"), col("hour"),
          last(col("cnt"), ignoreNulls = true).over(w).as("cnt"))
      },
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
             |           FROM events WHERE user_id < 8 GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour
             |         FROM b),
             |h AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour, count(*) AS cnt
             |      FROM events WHERE user_id < 8 GROUP BY 1, 2),
             |j AS (SELECT grid.user_id, grid.hour, h.cnt
             |      FROM grid LEFT JOIN h USING (user_id, hour))
             |SELECT user_id, hour,
             |  last_value(cnt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
             |FROM j""".stripMargin)),

    // upsample + bfill / nearest (reference resample.py:478 backfill,
    // :582 nearest): the same grid join, padded backward / from the
    // nearer known bucket. Tie (equidistant) takes the PREVIOUS bucket —
    // documented engine semantics, applied identically in the oracle.
    QueryDef("upsample_bfill_nearest",
      (s, d) => {
        val ev = T.events(s, d).filter(col("user_id") < 8)
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("mn"), max(col("ts")).as("mx"))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
        val hourly = ev.groupBy(col("user_id"),
            window(col("ts"), "1 hour").getField("start").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val joined = grid.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("pos", expr("unix_micros(hour) div 3600000000"))
        val w = Window.partitionBy("user_id").orderBy("pos")
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("cnt"), ignoreNulls = true).over(before)
        val nv = first(col("cnt"), ignoreNulls = true).over(after)
        val pp = last(when(col("cnt").isNotNull, col("pos")), ignoreNulls = true).over(before)
        val np = first(when(col("cnt").isNotNull, col("pos")), ignoreNulls = true).over(after)
        val nearest = when(col("cnt").isNotNull, col("cnt"))
          .when(pv.isNull, nv)
          .when(nv.isNull, pv)
          .when(col("pos") - pp <= np - col("pos"), pv)
          .otherwise(nv)
        joined.select(col("user_id"), col("hour"),
          nv.as("bfill"), nearest.as("nearest"))
      },
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
             |           FROM events WHERE user_id < 8 GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour
             |         FROM b),
             |h AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour, count(*) AS cnt
             |      FROM events WHERE user_id < 8 GROUP BY 1, 2),
             |j AS (SELECT grid.user_id, grid.hour, h.cnt,
             |        epoch_us(grid.hour) // 3600000000 AS pos
             |      FROM grid LEFT JOIN h USING (user_id, hour)),
             |w AS (SELECT user_id, hour, cnt, pos,
             |    last_value(cnt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    first_value(cnt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    last_value(CASE WHEN cnt IS NOT NULL THEN pos END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
             |    first_value(CASE WHEN cnt IS NOT NULL THEN pos END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
             |  FROM j)
             |SELECT user_id, hour, nv AS bfill,
             |  CASE WHEN cnt IS NOT NULL THEN cnt
             |       WHEN pv IS NULL THEN nv
             |       WHEN nv IS NULL THEN pv
             |       WHEN pos - pp <= np - pos THEN pv
             |       ELSE nv END AS nearest
             |FROM w""".stripMargin)),

    // resample().interpolate(): upsample to the hourly grid, then
    // linear interpolation across the empty buckets — grid positions
    // are exact epoch-hour integers, sums exact decimal, so the
    // interpolated doubles are bit-identical cross-engine.
    QueryDef("resample_interpolate",
      (s, d) => {
        val ev = T.events(s, d).filter(col("user_id") < 8)
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("mn"), max(col("ts")).as("mx"))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
        val hourly = ev.groupBy(col("user_id"),
            window(col("ts"), "1 hour").getField("start").as("hour"))
          .agg(dsum(col("value")).as("v"))
        val base = grid.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("pos", expr("unix_micros(hour) div 3600000000"))
        val w = Window.partitionBy("user_id").orderBy("pos")
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("v"), ignoreNulls = true).over(before)
        val nv = first(col("v"), ignoreNulls = true).over(after)
        val pp = last(when(col("v").isNotNull, col("pos")), ignoreNulls = true).over(before)
        val np = first(when(col("v").isNotNull, col("pos")), ignoreNulls = true).over(after)
        val interp = when(col("v").isNotNull, col("v"))
          .when(pv.isNull, lit(null))
          .when(nv.isNull, pv)
          .otherwise((dec2(pv) * (np - pp) + (dec2(nv) - dec2(pv)) * (col("pos") - pp))
            .cast("double") / (np - pp))
        base.select(col("user_id"), col("hour"), interp.as("v"))
      },
      Some(s"""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS mn, max(ts) AS mx
              |           FROM events WHERE user_id < 8 GROUP BY 1),
              |grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour
              |         FROM b),
              |h AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour,
              |        ${Q.dsumSql("value")} AS v
              |      FROM events WHERE user_id < 8 GROUP BY 1, 2),
              |j AS (SELECT grid.user_id, grid.hour, h.v,
              |        epoch_us(grid.hour) // 3600000000 AS pos
              |      FROM grid LEFT JOIN h USING (user_id, hour)),
              |w AS (SELECT user_id, hour, v, pos,
              |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY pos
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY pos
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
              |    first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY pos
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
              |  FROM j)
              |SELECT user_id, hour,
              |  CASE WHEN v IS NOT NULL THEN v
              |       WHEN pv IS NULL THEN NULL
              |       WHEN nv IS NULL THEN pv
              |       ELSE CAST(${Q.dec2Sql("pv")} * (np - pp)
              |                 + (${Q.dec2Sql("nv")} - ${Q.dec2Sql("pv")}) * (pos - pp) AS DOUBLE)
              |            / (np - pp) END AS v
              |FROM w""".stripMargin)),

    QueryDef("between_time",
      (s, d) => T.events(s, d).filter(
          (hour(col("ts")) > 2 || (hour(col("ts")) === 2 && minute(col("ts")) >= 15)) &&
          (hour(col("ts")) < 3 || (hour(col("ts")) === 3 && minute(col("ts")) <= 45)))
        .select("event_id"),
      Some("""SELECT event_id FROM events
             |WHERE (hour(ts) > 2 OR (hour(ts) = 2 AND minute(ts) >= 15))
             |  AND (hour(ts) < 3 OR (hour(ts) = 3 AND minute(ts) <= 45))""".stripMargin)),

    QueryDef("at_time",
      (s, d) => T.events(s, d)
        .filter(date_format(col("ts"), "HH:mm") === "12:30")
        .select("event_id"),
      Some("SELECT event_id FROM events WHERE strftime(ts, '%H:%M') = '12:30'"))
  )
}

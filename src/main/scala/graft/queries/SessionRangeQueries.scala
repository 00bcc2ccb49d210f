package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.RollingOps
import org.apache.spark.sql.functions._

/** Interval/range joins, session windows, weighted rolling windows,
  * first/last valid index (SURVEY §2.3 interval join, §2.10 sessions,
  * §2.5 win_type, §2.11 *_valid_index). */
object SessionRangeQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    // Non-equi (theta) range join against a broadcast bins dimension —
    // the IntervalIndex.get_indexer analog (reference
    // core/indexes/interval.py:129, intervaltree lookup → range join).
    QueryDef("range_join_bins",
      (s, d) => {
        import s.implicits._
        val bins = Seq((0.0, 50.0, "low"), (50.0, 150.0, "mid"),
          (150.0, 300.0, "high"), (300.0, 1e6, "xl"))
          .toDF("lo", "hi", "label")
        T.events(s, d).join(broadcast(bins),
            col("value") >= col("lo") && col("value") < col("hi"))
          .select("event_id", "label")
      },
      Some("""SELECT event_id, label FROM events
             |JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
             |             (150.0, 300.0, 'high'), (300.0, 1000000.0, 'xl'))
             |  AS bins(lo, hi, label)
             |ON value >= lo AND value < hi""".stripMargin)),

    // session_window: gap-based sessionization (Spark-native; oracle =
    // classic lag/gap-flag/cumsum sessionization).
    QueryDef("session_window_30m",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("cnt"), col("sum_value")),
      Some(s"""WITH o AS (SELECT user_id, ts, value,
              |    CASE WHEN lag(ts) OVER w IS NULL
              |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              |         THEN 1 ELSE 0 END AS brk
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |sess AS (SELECT user_id, ts, value,
              |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, brk DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |  FROM o)
              |SELECT user_id, min(ts) AS session_start, count(*) AS cnt,
              |  ${dsumSql("value")} AS sum_value
              |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // win_type weighted rolling: triangular [1,2,3,2,1] over a 5-row
    // frame, exact in integer cents (reference window.py:434 Window,
    // kernel window.pyx:1664 roll_window).
    QueryDef("rolling_weighted_triang",
      (s, d) => {
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 5)
        val cents = (dec2(col("value")) * 100).cast("long")
        val base = T.events(s, d).withColumn("c", cents)
        val l = collect_list(col("c")).over(w)
        val weights = array(lit(1L), lit(2L), lit(3L), lit(2L), lit(1L))
        val wsum = aggregate(zip_with(l, weights, (x, wt) => x * wt),
          lit(0L), (acc, x) => acc + x)
        base.select(col("event_id"),
          when(size(l) === 5, wsum.cast("double") / 100.0 / 9.0).as("tri_mean"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, ts,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events),
             |w AS (SELECT event_id, list(c) OVER w AS l FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             |SELECT event_id, CASE WHEN len(l) = 5 THEN
             |  CAST(list_reduce(list_transform(generate_series(1, 5),
             |    i -> l[i] * ([1, 2, 3, 2, 1])[i]), (a, b) -> a + b) AS DOUBLE) / 100.0 / 9.0
             |END AS tri_mean
             |FROM w""".stripMargin)),

    // win_type='gaussian' (std=2) over a 7-row frame. Transcendental
    // weights are precomputed ONCE on the driver and pasted into both
    // engines as shortest-round-trip double literals, so the per-row
    // arithmetic is identical ordered IEEE ops — the engines' exp()
    // disagree at 1 ULP and must not run per-row.
    QueryDef("rolling_weighted_gauss",
      (s, d) => {
        val ws = (0 until 7).map(i => math.exp(-0.5 * math.pow((i - 3) / 2.0, 2)))
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 7)
        val l = collect_list(col("value")).over(w)
        val weights = array(ws.map(lit): _*)
        val num = aggregate(zip_with(l, weights, (x, wt) => x * wt),
          lit(0.0), (acc, x) => acc + x)
        T.events(s, d).select(col("event_id"),
          when(size(l) === 7, round(num / lit(ws.sum), 6)).as("gauss_mean"))
      },
      Some {
        val ws = (0 until 7).map(i => math.exp(-0.5 * math.pow((i - 3) / 2.0, 2)))
        // list_reduce = strict left fold, matching Spark's aggregate();
        // list_sum's accumulation order is unspecified for doubles.
        s"""WITH w AS (SELECT event_id, list(value) OVER w AS l FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           |SELECT event_id, CASE WHEN len(l) = 7 THEN
           |  round(list_reduce(list_transform(generate_series(1, 7),
           |    i -> l[i] * ([${ws.mkString(", ")}])[i]), (a, b) -> a + b) / ${ws.sum}, 6)
           |END AS gauss_mean
           |FROM w""".stripMargin
      }),

    // win_type='hamming' (M=7): cosine-series weights precomputed on the
    // driver (WindowWeights) and pasted into both engines as round-trip
    // double literals — same discipline as gauss above.
    QueryDef("rolling_weighted_hamming",
      (s, d) => {
        import graft.operators.WindowWeights
        val ws = WindowWeights.hamming(7)
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 7)
        T.events(s, d).select(col("event_id"),
          WindowWeights.weightedMean(col("value"), w, ws).as("ham_mean"))
      },
      Some {
        val ws = graft.operators.WindowWeights.hamming(7)
        s"""WITH w AS (SELECT event_id, list(value) OVER w AS l FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           |SELECT event_id, CASE WHEN len(l) = 7 THEN
           |  round(list_reduce(list_transform(generate_series(1, 7),
           |    i -> l[i] * ([${ws.mkString(", ")}])[i]), (a, b) -> a + b) / ${ws.sum}, 6)
           |END AS ham_mean
           |FROM w""".stripMargin
      }),

    // win_type='blackman' (M=7): same driver-literal discipline.
    QueryDef("rolling_weighted_blackman",
      (s, d) => {
        import graft.operators.WindowWeights
        val ws = WindowWeights.blackman(7)
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 7)
        T.events(s, d).select(col("event_id"),
          WindowWeights.weightedMean(col("value"), w, ws).as("black_mean"))
      },
      Some {
        val ws = graft.operators.WindowWeights.blackman(7)
        s"""WITH w AS (SELECT event_id, list(value) OVER w AS l FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           |SELECT event_id, CASE WHEN len(l) = 7 THEN
           |  round(list_reduce(list_transform(generate_series(1, 7),
           |    i -> l[i] * ([${ws.mkString(", ")}])[i]), (a, b) -> a + b) / ${ws.sum}, 6)
           |END AS black_mean
           |FROM w""".stripMargin
      }),

    // win_type='kaiser' (β=8.6) and 'exponential' (τ=2) — the
    // PARAMETERIZED scipy windows (reference window.py:434 accepts
    // win_type kwargs); same driver-literal discipline: Bessel/exp
    // evaluated once on the driver (WindowWeights, numpy-verified in
    // WindowWeightsSpec), pasted into both engines as round-trip double
    // literals.
    QueryDef("rolling_weighted_kaiser",
      (s, d) => {
        import graft.operators.WindowWeights
        val wk = WindowWeights.kaiser(7, 8.6)
        val we = WindowWeights.exponential(7, 2.0)
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 7)
        T.events(s, d).select(col("event_id"),
          WindowWeights.weightedMean(col("value"), w, wk).as("kaiser_mean"),
          WindowWeights.weightedMean(col("value"), w, we).as("exp_mean"))
      },
      Some {
        val wk = graft.operators.WindowWeights.kaiser(7, 8.6)
        val we = graft.operators.WindowWeights.exponential(7, 2.0)
        s"""WITH w AS (SELECT event_id, list(value) OVER w AS l FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           |SELECT event_id,
           |  CASE WHEN len(l) = 7 THEN
           |    round(list_reduce(list_transform(generate_series(1, 7),
           |      i -> l[i] * ([${wk.mkString(", ")}])[i]), (a, b) -> a + b) / ${wk.sum}, 6)
           |  END AS kaiser_mean,
           |  CASE WHEN len(l) = 7 THEN
           |    round(list_reduce(list_transform(generate_series(1, 7),
           |      i -> l[i] * ([${we.mkString(", ")}])[i]), (a, b) -> a + b) / ${we.sum}, 6)
           |  END AS exp_mean
           |FROM w""".stripMargin
      }),

    // win_type='bartlett' (M=5, weights [0,½,1,½,0] → ×2 integer
    // [0,1,2,1,0]) and 'boxcar' (plain mean as a win_type): both exact
    // in integer cents, no rounding needed — the only doubles are the
    // final identical-ordered divisions.
    QueryDef("rolling_weighted_bartlett",
      (s, d) => {
        val w = RollingOps.fixed(Seq("user_id"), Seq(col("ts"), col("event_id")), 5)
        val cents = (dec2(col("value")) * 100).cast("long")
        val base = T.events(s, d).withColumn("c", cents)
        val l = collect_list(col("c")).over(w)
        val bart2 = array(lit(0L), lit(1L), lit(2L), lit(1L), lit(0L))
        val bsum = aggregate(zip_with(l, bart2, (x, wt) => x * wt),
          lit(0L), (acc, x) => acc + x)
        val boxsum = aggregate(l, lit(0L), (acc, x) => acc + x)
        base.select(col("event_id"),
          when(size(l) === 5, bsum.cast("double") / 100.0 / 4.0).as("bart_mean"),
          when(size(l) === 5, boxsum.cast("double") / 100.0 / 5.0).as("box_mean"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, ts,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events),
             |w AS (SELECT event_id, list(c) OVER w AS l FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             |SELECT event_id,
             |  CASE WHEN len(l) = 5 THEN
             |    CAST(list_reduce(list_transform(generate_series(1, 5),
             |      i -> l[i] * ([0, 1, 2, 1, 0])[i]), (a, b) -> a + b) AS DOUBLE) / 100.0 / 4.0
             |  END AS bart_mean,
             |  CASE WHEN len(l) = 5 THEN
             |    CAST(list_reduce(l, (a, b) -> a + b) AS DOUBLE) / 100.0 / 5.0
             |  END AS box_mean
             |FROM w""".stripMargin)),

    // first_valid_index / last_valid_index (reference generic.py:9826).
    QueryDef("valid_index_bounds",
      (s, d) => T.events(s, d)
        .withColumn("a", when(col("value") < 50, lit(null)).otherwise(col("value")))
        .groupBy("user_id")
        .agg(min(when(col("a").isNotNull, col("ts"))).as("first_valid"),
          max(when(col("a").isNotNull, col("ts"))).as("last_valid")),
      Some("""SELECT user_id,
             |  min(CASE WHEN value >= 50 THEN ts END) AS first_valid,
             |  max(CASE WHEN value >= 50 THEN ts END) AS last_valid
             |FROM events GROUP BY user_id""".stripMargin))
  )
}

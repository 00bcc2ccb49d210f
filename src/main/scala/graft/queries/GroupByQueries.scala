package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.GroupOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-by family (SURVEY §2.4). Partial+final hash aggregation with
  * map-side combine is Catalyst's default — the one-pass factorized
  * kernel of the reference (groupby/ops.py:411) at cluster scale.
  * Transform/cumulative/rank/shift are single-shuffle window forms.
  */
object GroupByQueries extends QueryModule {

  private val T = Tables
  import Q._

  private def eventsOrder = Seq(col("ts"), col("event_id"))

  def defs: Seq[QueryDef] = Seq(

    // groupby.head(n) by explicit order (GroupOps.headPerKey): each
    // user's 5 smallest event_ids, ALL rows kept intact. The engine
    // side is the skew-safe bounded-buffer aggregate (state capped at
    // n, partial-aggregated map-side — never a per-key window); the
    // oracle recomputes with the window row_number a single-node engine
    // can afford. PlanAuditSpec pins the no-window plan shape.
    QueryDef("group_head_n",
      (s, d) => GroupOps.headPerKey(
        T.events(s, d), Seq("user_id"), "event_id", 5)
        .select("user_id", "event_id"),
      Some("""SELECT user_id, event_id FROM (
             |  SELECT user_id, event_id, row_number() OVER (
             |    PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events) WHERE rn <= 5""".stripMargin)),

    // The TIMESTAMP-ordered twin (r12 verdict task #9): each user's 3
    // earliest events by event TIME, ranked through the same bounded
    // BoundedMinList buffer via unix_micros — exact micros, no
    // seconds-truncating long cast, no caller-derived key. (user_id,
    // ts) is duplicate-free in this corpus, so row_number is an exact
    // oracle; sub-second order is real in the data, so a truncating
    // cast regression changes winners and hash-fails.
    QueryDef("group_head_n_ts",
      (s, d) => GroupOps.headPerKey(
        T.events(s, d), Seq("user_id"), "ts", 3)
        .select("user_id", "event_id", "ts"),
      Some("""SELECT user_id, event_id, ts FROM (
             |  SELECT user_id, event_id, ts, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts) AS rn
             |  FROM events) WHERE rn <= 3""".stripMargin)),

    // groupby.nth(k) by explicit order (GroupOps.nthPerKey): each
    // user's 3rd-smallest event (0-indexed k=2); users with fewer than
    // 3 events drop, matching the reference's nth semantics.
    QueryDef("group_nth",
      (s, d) => GroupOps.nthPerKey(
        T.events(s, d), Seq("user_id"), "event_id", 2)
        .select("user_id", "event_id"),
      Some("""SELECT user_id, event_id FROM (
             |  SELECT user_id, event_id, row_number() OVER (
             |    PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events) WHERE rn = 3""".stripMargin)),

    // groupby str.cat / string_agg: order pinned by sorting the
    // collected values (equal elements interchangeable → deterministic).
    QueryDef("groupby_str_cat",
      (s, d) => T.events(s, d).groupBy("user_id")
        .agg(array_join(array_sort(collect_list(col("event_type"))), ",")
          .as("types")),
      Some("""SELECT user_id,
             |  string_agg(event_type, ',' ORDER BY event_type) AS types
             |FROM events GROUP BY user_id""".stripMargin)),

    QueryDef("groupby_multi_agg",
      (s, d) => T.lineitem(s, d).groupBy("l_returnflag").agg(
        count(lit(1)).as("cnt"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty")),
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
             |  count(DISTINCT l_suppkey) AS n_supp,
             |  round(stddev_samp(l_quantity), 4) AS sd_qty,
             |  round(var_samp(l_quantity), 4) AS var_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // transform: group mean broadcast back to rows via window (no join).
    QueryDef("groupby_transform_demean",
      (s, d) => {
        val w = Window.partitionBy("user_id")
        val mean = sum(dec2(col("value"))).over(w).cast("double") /
          count(col("value")).over(w)
        T.events(s, d).select(col("event_id"),
          (col("value") - mean).as("demeaned"))
      },
      Some("""SELECT event_id, value -
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id) AS DOUBLE)
             |  / count(value) OVER (PARTITION BY user_id) AS demeaned
             |FROM events""".stripMargin)),

    // cumulative per group — exact decimal running sum.
    QueryDef("groupby_cumsum",
      (s, d) => T.events(s, d).select(col("event_id"),
        GroupOps.cumAgg(sum(dec2(col("value"))), Seq("user_id"), eventsOrder)
          .cast("double").as("cum_value"),
        GroupOps.cumAgg(max(col("value")), Seq("user_id"), eventsOrder).as("cum_max"),
        GroupOps.cumcount(Seq("user_id"), eventsOrder).as("cum_n")),
      Some("""SELECT event_id,
             |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS cum_value,
             |  max(value) OVER w AS cum_max,
             |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS cum_n
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    QueryDef("groupby_rank",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("value").asc)
        T.events(s, d).select(col("event_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          GroupOps.rankAverage(col("value"), Seq("event_type"),
            Seq(col("event_id"))).as("rank_avg"))
      },
      Some("""SELECT event_id,
             |  rank() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
             |  dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drnk,
             |  avg(rn) OVER (PARTITION BY event_type, value) AS rank_avg
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY event_type ORDER BY value, event_id) AS rn
             |      FROM events)""".stripMargin)),

    QueryDef("groupby_shift",
      (s, d) => T.events(s, d).select(col("event_id"),
        GroupOps.shift(col("value"), 1, Seq("user_id"), eventsOrder).as("prev_value"),
        GroupOps.lead_(col("value"), 2, Seq("user_id"), eventsOrder).as("next2_value")),
      Some("""SELECT event_id,
             |  lag(value, 1) OVER w AS prev_value,
             |  lead(value, 2) OVER w AS next2_value
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    QueryDef("groupby_filter_size",
      (s, d) => GroupOps.filterBySize(T.events(s, d), Seq("user_id"), 80L)
        .select("event_id", "user_id"),
      Some("""SELECT event_id, user_id FROM (
             |  SELECT *, count(*) OVER (PARTITION BY user_id) AS sz FROM events)
             |WHERE sz >= 80""".stripMargin)),

    QueryDef("groupby_nth",
      (s, d) => GroupOps.nth(T.events(s, d), Seq("user_id"), eventsOrder, 2)
        .select("user_id", "event_id"),
      Some("""SELECT user_id, event_id FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
             |WHERE rn = 3""".stripMargin)),

    QueryDef("groupby_ohlc",
      (s, d) => GroupOps.ohlc(T.events(s, d), Seq("user_id"), "value", eventsOrder),
      Some("""WITH w AS (SELECT user_id, value,
             |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS o,
             |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
             |  FROM events)
             |SELECT user_id, max(o) AS open, max(value) AS high,
             |       min(value) AS low, max(c) AS close
             |FROM w GROUP BY user_id""".stripMargin)),

    // idxmax/idxmin with pandas first-occurrence tie-break.
    QueryDef("groupby_idxmax",
      (s, d) => {
        val wmax = Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id").asc)
        val wmin = Window.partitionBy("event_type")
          .orderBy(col("value").asc, col("event_id").asc)
        val e = T.events(s, d)
        val mx = e.withColumn("rn", row_number().over(wmax)).filter(col("rn") === 1)
          .select(col("event_type"), col("event_id").as("idxmax"))
        val mn = e.withColumn("rn", row_number().over(wmin)).filter(col("rn") === 1)
          .select(col("event_type"), col("event_id").as("idxmin"))
        mx.join(mn, Seq("event_type"))
      },
      Some("""WITH mx AS (SELECT event_type, event_id AS idxmax FROM (
             |    SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rn FROM events) WHERE rn = 1),
             |     mn AS (SELECT event_type, event_id AS idxmin FROM (
             |    SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY value ASC, event_id) AS rn FROM events) WHERE rn = 1)
             |SELECT event_type, idxmax, idxmin FROM mx JOIN mn USING (event_type)""".stripMargin)),

    // exact percentiles (linear interpolation — matches quantile_cont).
    QueryDef("groupby_quantiles",
      (s, d) => T.events(s, d).groupBy("event_type").agg(
        round(percentile(col("value"), lit(0.5)), 4).as("median"),
        round(percentile(col("value"), lit(0.25)), 4).as("p25"),
        round(percentile(col("value"), lit(0.75)), 4).as("p75")),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 4) AS median,
             |  round(quantile_cont(value, 0.25), 4) AS p25,
             |  round(quantile_cont(value, 0.75), 4) AS p75
             |FROM events GROUP BY event_type""".stripMargin)),

    // SKETCH-tier quantiles — the 100 TB describe() path: exact
    // percentile materializes every group's values for a sort, while
    // percentile_approx rides a mergeable Greenwald-Khanna summary
    // (memory bounded by `accuracy`, partial+final aggregation, no
    // per-group sort), the only formulation that survives a 10^9-row
    // group. At accuracy ≥ group size the summary retains every sample
    // and the answer degenerates to the EXACT nearest-rank element —
    // which is what the oracle pins (Spark's rank: the smallest sample
    // with position ≥ ceil(p·n); no interpolation, the returned double
    // is an element of the input so it hash-compares verbatim). The
    // approximation contract at scale (rank error ≤ n/accuracy) is
    // spec-asserted in GroupOpsSpec next to this gate's exact regime.
    QueryDef("approx_quantile_sketch",
      (s, d) => T.events(s, d).groupBy("event_type").agg(
        percentile_approx(col("value"), lit(0.5), lit(100000)).as("p50"),
        percentile_approx(col("value"), lit(0.9), lit(100000)).as("p90"),
        percentile_approx(col("value"), lit(0.99), lit(100000)).as("p99")),
      Some("""WITH r AS (SELECT event_type, value, row_number() OVER (
             |    PARTITION BY event_type ORDER BY value) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events WHERE value IS NOT NULL),
             |p AS (SELECT event_type,
             |    min(CASE WHEN rn >= ceil(0.5 * n)  THEN value END) AS p50,
             |    min(CASE WHEN rn >= ceil(0.9 * n)  THEN value END) AS p90,
             |    min(CASE WHEN rn >= ceil(0.99 * n) THEN value END) AS p99
             |  FROM r GROUP BY event_type)
             |SELECT g.event_type, p.p50, p.p90, p.p99
             |FROM (SELECT DISTINCT event_type FROM events) g
             |LEFT JOIN p USING (event_type)""".stripMargin)),

    QueryDef("groupby_any_all",
      (s, d) => T.events(s, d).groupBy("user_id").agg(
        bool_or(col("value") > 400).as("any_big"),
        bool_and(col("value") > 0.005).as("all_pos"),
        count(lit(1)).as("n")),
      Some("""SELECT user_id, bool_or(value > 400) AS any_big,
             |  bool_and(value > 0.005) AS all_pos, count(*) AS n
             |FROM events GROUP BY user_id""".stripMargin)),

    // sem (standard error of the mean) and prod — sem from the exact
    // cent variance formula / sqrt(n); prod via exp∘Σ∘ln on a positive
    // rescaling (pandas compound-style), round(6) absorbing libm ulps.
    QueryDef("groupby_sem_prod",
      (s, d) => {
        val cents = (dec2(col("value")) * 100).cast("long")
        val base = T.events(s, d).withColumn("c", cents)
        val agg = base.groupBy("event_type").agg(
          count(col("c")).as("n"), sum(col("c")).as("sx"),
          sum(col("c") * col("c")).as("sxx"),
          sum(log(lit(1.0) + col("value") / 1000000.0)).as("slog"))
        val n = col("n")
        val variance = (n * col("sxx") - col("sx") * col("sx")).cast("double") /
          (n * (n - 1)) / 10000.0
        agg.select(col("event_type"),
          when(n >= 2, round(sqrt(variance) / sqrt(n.cast("double")), 6)).as("sem"),
          round(exp(col("slog")), 6).as("prod1p"))
      },
      Some("""WITH b AS (SELECT event_type, value,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events),
             |a AS (SELECT event_type, count(c) AS n, sum(c) AS sx,
             |    sum(c * c) AS sxx, sum(ln(1.0 + value / 1000000.0)) AS slog
             |  FROM b GROUP BY event_type)
             |SELECT event_type,
             |  CASE WHEN n >= 2 THEN
             |    round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1)) / 10000.0)
             |          / sqrt(CAST(n AS DOUBLE)), 6) END AS sem,
             |  round(exp(slog), 6) AS prod1p
             |FROM a""".stripMargin)),

    // groupby(dropna=True) — the pandas DEFAULT drops null keys, while
    // Spark's groupBy keeps them: the engine pins pandas semantics with
    // an explicit key filter; dropna=False is plain groupBy (the null
    // group surfaces like any other).
    QueryDef("groupby_dropna_true",
      (s, d) => {
        val masked = when(col("event_type") === "error", lit(null))
          .otherwise(col("event_type"))
        T.events(s, d).withColumn("k", masked)
          .filter(col("k").isNotNull)
          .groupBy("k").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT k, count(*) AS n FROM (
             |  SELECT CASE WHEN event_type = 'error' THEN NULL
             |              ELSE event_type END AS k FROM events)
             |WHERE k IS NOT NULL GROUP BY k""".stripMargin)),

    QueryDef("groupby_dropna_false",
      (s, d) => {
        val masked = when(col("event_type") === "error", lit(null))
          .otherwise(col("event_type"))
        T.events(s, d).withColumn("k", masked)
          .groupBy("k").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT k, count(*) AS n FROM (
             |  SELECT CASE WHEN event_type = 'error' THEN NULL
             |              ELSE event_type END AS k FROM events)
             |GROUP BY k""".stripMargin)),

    // value_counts(normalize=True): shares instead of counts.
    QueryDef("value_counts_normalize",
      (s, d) => {
        val counts = T.events(s, d).groupBy("event_type")
          .agg(count(lit(1)).as("cnt"))
        counts.withColumn("share",
          col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy()))
          .select("event_type", "share")
      },
      Some("""SELECT event_type,
             |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events) AS share
             |FROM events GROUP BY event_type""".stripMargin)),

    // mean absolute deviation: window mean, then agg (two-pass formula).
    QueryDef("groupby_mad",
      (s, d) => {
        val w = Window.partitionBy("event_type")
        val mean = sum(dec2(col("value"))).over(w).cast("double") /
          count(col("value")).over(w)
        T.events(s, d).withColumn("absdev", abs(col("value") - mean))
          .groupBy("event_type")
          .agg(round(avg(col("absdev")), 4).as("mad"))
      },
      Some("""SELECT event_type, round(avg(absdev), 4) AS mad FROM (
             |  SELECT event_type, abs(value -
             |    CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY event_type) AS DOUBLE)
             |    / count(value) OVER (PARTITION BY event_type)) AS absdev
             |  FROM events) GROUP BY event_type""".stripMargin)),

    QueryDef("groupby_value_counts",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id") % 10, col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumnRenamed("(user_id % 10)", "bucket"),
      Some("""SELECT user_id % 10 AS bucket, event_type, count(*) AS cnt
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // rollup / cube / grouping flags (absent in the reference — pandas
    // only has pivot margins; Spark exposes them natively, SURVEY §2.4).
    QueryDef("rollup_counts",
      (s, d) => T.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |  GROUPING(o_orderstatus) AS g_status,
             |  GROUPING(o_orderpriority) AS g_prio
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    QueryDef("cube_sum",
      (s, d) => T.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
             |  GROUPING(o_orderstatus) AS g_status,
             |  GROUPING(o_orderpriority) AS g_prio
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // pivot_table(index=priority, columns=status, aggfunc=count).
    QueryDef("pivot_table_orders",
      (s, d) => {
        val p = T.orders(s, d).groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        p.select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
      },
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    QueryDef("pivot_table_sum",
      (s, d) => T.orders(s, d).groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice"))),
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F'
             |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
             |  CAST(sum(CASE WHEN o_orderstatus = 'O'
             |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
             |  CAST(sum(CASE WHEN o_orderstatus = 'P'
             |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS P
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // crosstab(normalize='index'): row-share matrix.
    QueryDef("crosstab_norm",
      (s, d) => {
        val cnt = T.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("user_id")
        cnt.select(col("user_id"), col("event_type"),
          (col("cnt") / sum(col("cnt")).over(w)).as("share"))
      },
      Some("""SELECT user_id, event_type,
             |  cnt / CAST(sum(cnt) OVER (PARTITION BY user_id) AS DOUBLE) AS share
             |FROM (SELECT user_id, event_type, count(*) AS cnt
             |      FROM events GROUP BY 1, 2)""".stripMargin)),

    // Per-key OLS (GroupOps.linearFit) — groupby().apply(polyfit)
    // without a per-group collect: value trend per user over time as
    // ONE map-side-combinable aggregation of exact DECIMAL(38,0)
    // power sums on integer-scaled inputs (seconds since 2024-01-01 ×
    // value cents), closed-form slope/intercept as IEEE division of
    // exactly-cast operands. The oracle replays the sums in HUGEINT
    // with the sign·abs double-cast idiom (DuckDB's negative
    // HUGEINT→DOUBLE cast is 1 ulp off the direct cast Spark uses).
    // Degenerate groups (under 2 points / zero x-variance) are NULL
    // fits on both sides.
    QueryDef("groupby_linfit",
      (s, d) => {
        import graft.operators.GroupOps
        val ev = T.events(s, d).select(col("user_id"),
          expr("unix_micros(ts) div 1000000 - 1704067200").as("x"),
          (dec2(col("value")) * 100).cast("long").as("y"))
        GroupOps.linearFit(ev, Seq("user_id"), col("x"), col("y"))
      },
      Some("""WITH e AS (SELECT user_id,
             |    epoch_us(ts) // 1000000 - 1704067200 AS x,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
             |  FROM events),
             |g AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
             |  FROM e GROUP BY user_id),
             |c AS (SELECT user_id, CAST(n AS BIGINT) AS n_points,
             |    CASE WHEN n >= 2 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0
             |      THEN sign(n*sxy - sx*sy) * CAST(abs(n*sxy - sx*sy) AS DOUBLE)
             |        / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope,
             |    sy, sx, n FROM g)
             |SELECT user_id, n_points, slope,
             |  CASE WHEN slope IS NOT NULL
             |    THEN (sign(sy) * CAST(abs(sy) AS DOUBLE)
             |      - slope * sign(sx) * CAST(abs(sx) AS DOUBLE))
             |      / CAST(n AS DOUBLE) END AS intercept
             |FROM c""".stripMargin))
  )
}

package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Reshape + elementwise math (SURVEY §2.8, §2.9 math; reference:
  * pandas/core/reshape/melt.py:25 melt, reshape.py:686 get_dummies,
  * tile.py:23 cut; frame.py:6798 corr, nanops.py:390-967 reductions).
  */
object ReshapeQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    // melt: wide→long via the stack() expression (no shuffle at all —
    // a flat map over rows).
    QueryDef("melt_orders",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        expr("stack(2, 'totalprice', o_totalprice, 'custkey', CAST(o_custkey AS DOUBLE))")
          .as(Seq("var", "val"))),
      Some("""SELECT o_orderkey, 'totalprice' AS var, o_totalprice AS val FROM orders
             |UNION ALL
             |SELECT o_orderkey, 'custkey' AS var, CAST(o_custkey AS DOUBLE) AS val
             |FROM orders""".stripMargin)),

    // wide_to_long: <stub><sep><suffix> columns → long rows keyed by
    // (i, j=suffix) (reference melt.py:181) — flat row-local explode,
    // no shuffle, like melt.
    QueryDef("wide_to_long",
      (s, d) => {
        import graft.operators.ReshapeOps
        val wide = T.orders(s, d).select(col("o_orderkey"),
          col("o_totalprice").as("amt_base"),
          (dec2(col("o_totalprice")) * 2).cast("double").as("amt_double"),
          year(col("o_orderdate")).cast("long").as("yr_base"),
          (year(col("o_orderdate")) + 1).cast("long").as("yr_double"))
        ReshapeOps.wideToLong(wide, Seq("amt", "yr"), Seq("o_orderkey"),
          "kind", sep = "_")
      },
      Some("""SELECT o_orderkey, 'base' AS kind, o_totalprice AS amt,
             |  CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders
             |UNION ALL
             |SELECT o_orderkey, 'double',
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE),
             |  CAST(year(o_orderdate) + 1 AS BIGINT) FROM orders""".stripMargin)),

    // lreshape: explicit column-group stacking (reference melt.py:111) —
    // same row-local explode family as wide_to_long, no suffix parsing.
    QueryDef("lreshape_groups",
      (s, d) => {
        import graft.operators.ReshapeOps
        val wide = T.orders(s, d).select(col("o_orderkey"),
          col("o_totalprice").as("p1"),
          (dec2(col("o_totalprice")) * 3).cast("double").as("p2"),
          year(col("o_orderdate")).cast("long").as("y1"),
          (year(col("o_orderdate")) + 10).cast("long").as("y2"))
        ReshapeOps.lreshape(wide, Seq("o_orderkey"),
          Map("amt" -> Seq("p1", "p2"), "yr" -> Seq("y1", "y2")))
      },
      Some("""SELECT o_orderkey, o_totalprice AS amt,
             |  CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders
             |UNION ALL
             |SELECT o_orderkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 3 AS DOUBLE),
             |  CAST(year(o_orderdate) + 10 AS BIGINT) FROM orders""".stripMargin)),

    // unstack(level) with fill_value: one level of the (prio, status)
    // multi-index pivots into columns (reference reshape.py:31
    // _Unstacker). Explicit pivotValues keep the plan one-pass.
    QueryDef("unstack_fill",
      (s, d) => {
        import graft.operators.ReshapeOps
        val long = T.orders(s, d)
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("n"))
        ReshapeOps.unstack(long, Seq("o_orderpriority"), "o_orderstatus",
          "n", pivotValues = Seq("F", "O", "P"), fillValue = Some(lit(0L)))
      },
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // get_dummies over a low-cardinality column: driver-side expr
    // codegen, one 0/1 column per category (reference reshape.py:686).
    QueryDef("get_dummies",
      (s, d) => {
        val cats = Seq("click", "error", "purchase", "signup", "view")
        val dummies = cats.map(c =>
          when(col("event_type") === c, 1).otherwise(0).as(s"is_$c"))
        T.events(s, d).select((col("event_id") +: dummies): _*)
      },
      Some("""SELECT event_id,
             |  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             |  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_error,
             |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
             |  CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_signup,
             |  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
             |FROM events""".stripMargin)),

    // cut(bins=[0,50,150,300,∞)): when-chain labeling.
    QueryDef("cut_bins",
      (s, d) => T.events(s, d).select(col("event_id"),
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .when(col("value") < 300, "high")
          .otherwise("extreme").as("bin")),
      Some("""SELECT event_id,
             |  CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
             |       WHEN value < 300 THEN 'high' ELSE 'extreme' END AS bin
             |FROM events""".stripMargin)),

    // cut(right=False, include_lowest) — left-closed bins, and
    // get_dummies(drop_first=True, dummy_na=True) — first category
    // dropped, an explicit null-indicator column.
    QueryDef("cut_left_closed",
      (s, d) => T.events(s, d).select(col("event_id"),
        when(col("value") >= 300, "extreme")
          .when(col("value") >= 150, "high")
          .when(col("value") >= 50, "mid")
          .otherwise("low").as("bin")),
      Some("""SELECT event_id,
             |  CASE WHEN value >= 300 THEN 'extreme' WHEN value >= 150 THEN 'high'
             |       WHEN value >= 50 THEN 'mid' ELSE 'low' END AS bin
             |FROM events""".stripMargin)),

    QueryDef("get_dummies_opts",
      (s, d) => {
        val masked = when(col("event_type") === "error", lit(null))
          .otherwise(col("event_type"))
        // categories sorted; drop_first drops 'click'; dummy_na adds is_na
        val cats = Seq("purchase", "signup", "view")
        val base = T.events(s, d).withColumn("k", masked)
        base.select((col("event_id") +:
          cats.map(c => when(col("k") === c, 1).otherwise(0).as(s"is_$c")) :+
          when(col("k").isNull, 1).otherwise(0).as("is_na")): _*)
      },
      Some("""SELECT event_id,
             |  CASE WHEN k = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
             |  CASE WHEN k = 'signup' THEN 1 ELSE 0 END AS is_signup,
             |  CASE WHEN k = 'view' THEN 1 ELSE 0 END AS is_view,
             |  CASE WHEN k IS NULL THEN 1 ELSE 0 END AS is_na
             |FROM (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL
             |        ELSE event_type END AS k FROM events)""".stripMargin)),

    // qcut(4): quantile bucketing — SQL-ntile arithmetic over the
    // distributed global row number (DistScan), no single-partition sort.
    QueryDef("qcut_quartiles",
      (s, d) => {
        import graft.operators.DistScan
        DistScan.globalNtile(T.events(s, d),
          Seq(col("value").asc, col("event_id").asc), 4, "bucket")
          .select("event_id", "bucket")
      },
      Some("""SELECT event_id, ntile(4) OVER (ORDER BY value, event_id) AS bucket
             |FROM events""".stripMargin)),

    // Hash-exact contract for transcendentals: sqrt is IEEE
    // correctly-rounded (bit-identical across engines) so it ships raw;
    // ln/exp differ by up to 1 ULP between libm implementations, so they
    // are compared as integer micro-units — round(f(x)*1e6) is
    // deterministic because no dataset value sits within 1.6e-6 of a
    // half-integer boundary (empirically checked at sf0.01 and sf0.1)
    // while the libm disagreement is ~1e-9 at this magnitude. round(d,6)
    // itself is NOT safe: Spark (BigDecimal HALF_UP) and DuckDB (libm
    // scale/divide) can return doubles 1 ULP apart for equal decimals.
    QueryDef("math_elementwise",
      (s, d) => T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        floor(col("l_quantity") / 7).as("fl"),
        ceil(col("l_quantity") / 7).as("ce"),
        sqrt(col("l_extendedprice")).as("sq"),
        round(log(col("l_extendedprice")) * 1e6).cast("long").as("ln_p6"),
        round(exp(col("l_discount")) * 1e6).cast("long").as("exp_d6"),
        pmod(col("l_orderkey"), lit(97)).as("m97")),
      Some("""SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS abs_d,
             |  CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
             |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ce,
             |  sqrt(l_extendedprice) AS sq,
             |  CAST(round(ln(l_extendedprice) * 1e6) AS BIGINT) AS ln_p6,
             |  CAST(round(exp(l_discount) * 1e6) AS BIGINT) AS exp_d6,
             |  l_orderkey % 97 AS m97
             |FROM lineitem""".stripMargin)),

    // corr/cov reductions (reference frame.py:6798; pearson only — the
    // engines' merge formulas agree to ~1e-12, rounded to 6).
    QueryDef("corr_cov",
      (s, d) => T.lineitem(s, d).groupBy("l_returnflag").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("pearson"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov")),
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 6) AS pearson,
             |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // describe(): count/mean/std/min/quartiles/max in one pass.
    QueryDef("describe_value",
      (s, d) => T.events(s, d).agg(
        count(col("value")).as("cnt"),
        davg(col("value")).as("mean"),
        round(stddev_samp(col("value")), 4).as("sd"),
        min(col("value")).as("mn"),
        round(percentile(col("value"), lit(0.25)), 4).as("q1"),
        round(percentile(col("value"), lit(0.5)), 4).as("q2"),
        round(percentile(col("value"), lit(0.75)), 4).as("q3"),
        max(col("value")).as("mx")),
      Some(s"""SELECT count(value) AS cnt, ${davgSql("value")} AS mean,
              |  round(stddev_samp(value), 4) AS sd, min(value) AS mn,
              |  round(quantile_cont(value, 0.25), 4) AS q1,
              |  round(quantile_cont(value, 0.5), 4) AS q2,
              |  round(quantile_cont(value, 0.75), 4) AS q3,
              |  max(value) AS mx
              |FROM events""".stripMargin)),

    // mode(): most frequent value with smallest-value tie-break.
    QueryDef("mode_value",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cnt = T.events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("cnt").desc, col("event_type").asc)
        cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("event_type", "cnt")
      },
      Some("""SELECT event_type, cnt FROM (
             |  SELECT event_type, count(*) AS cnt,
             |    row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
             |  FROM events GROUP BY event_type) WHERE rn = 1""".stripMargin)),

    // transpose / df.T (reference: frame.py:2244) on the shape it is
    // actually used for — a column-bounded stats block. Region-level
    // aggregates (5 rows) transpose into one column per region with the
    // stat names in 'column'; DuckDB states the transposed frame
    // directly with conditional aggregation. Pins the melt→unstack
    // composition, the numeric→double coercion, the deterministic
    // sorted column order, and the 'MIDDLE EAST' column (names with
    // spaces must survive both engines).
    QueryDef("transpose_region_stats",
      (s, d) => {
        import graft.operators.ReshapeOps
        val stats = T.nation(s, d).join(T.region(s, d),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).cast("double").as("n_nations"),
            sum(col("n_nationkey")).cast("double").as("key_sum"))
        ReshapeOps.transpose(stats, "r_name")
      },
      Some("""WITH s AS (SELECT r_name, CAST(count(*) AS DOUBLE) AS n_nations,
             |    CAST(sum(n_nationkey) AS DOUBLE) AS key_sum
             |  FROM nation JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY r_name)
             |SELECT 'n_nations' AS "column",
             |  max(CASE WHEN r_name='AFRICA' THEN n_nations END) AS "AFRICA",
             |  max(CASE WHEN r_name='AMERICA' THEN n_nations END) AS "AMERICA",
             |  max(CASE WHEN r_name='ASIA' THEN n_nations END) AS "ASIA",
             |  max(CASE WHEN r_name='EUROPE' THEN n_nations END) AS "EUROPE",
             |  max(CASE WHEN r_name='MIDDLE EAST' THEN n_nations END) AS "MIDDLE EAST"
             |FROM s
             |UNION ALL
             |SELECT 'key_sum',
             |  max(CASE WHEN r_name='AFRICA' THEN key_sum END),
             |  max(CASE WHEN r_name='AMERICA' THEN key_sum END),
             |  max(CASE WHEN r_name='ASIA' THEN key_sum END),
             |  max(CASE WHEN r_name='EUROPE' THEN key_sum END),
             |  max(CASE WHEN r_name='MIDDLE EAST' THEN key_sum END)
             |FROM s""".stripMargin))
  )
}

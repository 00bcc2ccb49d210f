package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.MissingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-data family (SURVEY §2.9 missing block; reference:
  * pandas/core/generic.py:5606 fillna + method/limit, :5792 ffill/bfill,
  * core/missing.py:111 interpolate_1d, generic.py:6098 replace).
  *
  * Source tables are null-free, so each query first synthesizes nulls
  * deterministically (value < 50 → null, ~10% of events), then repairs
  * them. All fills are one shuffle on the group key + an ordered window —
  * no global sort.
  */
object MissingQueries extends QueryModule {

  private val T = Tables

  /** events + nullable column `a`. */
  private def withA(s: SparkSession, d: String): DataFrame =
    T.events(s, d).withColumn("a",
      when(col("value") < 50, lit(null)).otherwise(col("value")))

  private val baseSql =
    """SELECT event_id, user_id, ts,
      |  CASE WHEN value < 50 THEN NULL ELSE value END AS a
      |FROM events""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    QueryDef("fillna_value",
      (s, d) => withA(s, d).select(col("event_id"), coalesce(col("a"), lit(-1.0)).as("filled")),
      Some(s"SELECT event_id, coalesce(a, -1.0) AS filled FROM ($baseSql)")),

    QueryDef("ffill_group",
      (s, d) => withA(s, d).select(col("event_id"),
        MissingOps.ffill(col("a"), Seq("user_id"), "ts").as("filled")),
      Some(s"""SELECT event_id, last_value(a IGNORE NULLS) OVER (
              |  PARTITION BY user_id ORDER BY ts
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
              |FROM ($baseSql)""".stripMargin)),

    QueryDef("bfill_group",
      (s, d) => withA(s, d).select(col("event_id"),
        MissingOps.bfill(col("a"), Seq("user_id"), "ts").as("filled")),
      Some(s"""SELECT event_id, first_value(a IGNORE NULLS) OVER (
              |  PARTITION BY user_id ORDER BY ts
              |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS filled
              |FROM ($baseSql)""".stripMargin)),

    QueryDef("ffill_limit",
      (s, d) => withA(s, d).select(col("event_id"),
        MissingOps.ffillLimit(col("a"), Seq("user_id"), "ts", 3).as("filled")),
      Some(s"""SELECT event_id, last_value(a IGNORE NULLS) OVER (
              |  PARTITION BY user_id ORDER BY ts
              |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS filled
              |FROM ($baseSql)""".stripMargin)),

    // interpolate(method='linear'): closed-form from two window passes —
    // plan-only composite, no custom exec (SURVEY §4.3). Oracle parity:
    // the interpolated value is computed as (exact decimal numerator) /
    // (integer gap) so both engines produce the bit-identical double —
    // rounding a x.xxx25-style tie would otherwise flip the hash.
    QueryDef("interpolate_linear",
      (s, d) => {
        val rn = row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
        val base = withA(s, d).withColumn("rn", rn)
        val w = Window.partitionBy("user_id").orderBy("rn")
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("a"), ignoreNulls = true).over(before)
        val nv = first(col("a"), ignoreNulls = true).over(after)
        val pp = last(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(before)
        val np = first(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(after)
        val interp = when(col("a").isNotNull, col("a"))
          .when(pv.isNull, lit(null))
          .when(nv.isNull, pv)
          .otherwise(
            (Q.dec2(pv) * (np - pp) + (Q.dec2(nv) - Q.dec2(pv)) * (col("rn") - pp))
              .cast("double") / (np - pp))
        base.select(col("event_id"), interp.as("interp"))
      },
      Some(s"""WITH base AS (
              |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |  FROM ($baseSql)
              |), w AS (
              |  SELECT event_id, a, rn,
              |    last_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    first_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    last_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
              |    first_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
              |  FROM base)
              |SELECT event_id,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NULL THEN NULL
              |       WHEN nv IS NULL THEN pv
              |       ELSE CAST(${Q.dec2Sql("pv")} * (np - pp)
              |                 + (${Q.dec2Sql("nv")} - ${Q.dec2Sql("pv")}) * (rn - pp) AS DOUBLE)
              |            / (np - pp) END AS interp
              |FROM w""".stripMargin)),

    // interpolate(limit=2, limit_direction='both', limit_area=...):
    // the limit variants (reference missing.py:111 interpolate_1d) are
    // fill MASKS over the same two-window closed form —
    //   inside : only gaps bracketed by valid values, within `limit`
    //            rows of either edge of the gap;
    //   outside: only leading/trailing runs, constant extension within
    //            `limit` rows of the nearest valid value.
    QueryDef("interpolate_limit_area",
      (s, d) => {
        val rn = row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
        val base = withA(s, d).withColumn("rn", rn)
        val w = Window.partitionBy("user_id").orderBy("rn")
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("a"), ignoreNulls = true).over(before)
        val nv = first(col("a"), ignoreNulls = true).over(after)
        val pp = last(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(before)
        val np = first(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(after)
        val lin = (Q.dec2(pv) * (np - pp) + (Q.dec2(nv) - Q.dec2(pv)) * (col("rn") - pp))
          .cast("double") / (np - pp)
        val inside = when(col("a").isNotNull, col("a"))
          .when(pv.isNotNull && nv.isNotNull &&
            (col("rn") - pp <= 2 || np - col("rn") <= 2), lin)
        val outside = when(col("a").isNotNull, col("a"))
          .when(pv.isNull && nv.isNotNull && np - col("rn") <= 2, nv)
          .when(nv.isNull && pv.isNotNull && col("rn") - pp <= 2, pv)
        base.select(col("event_id"), inside.as("interp_inside"),
          outside.as("fill_outside"))
      },
      Some(s"""WITH base AS (
              |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |  FROM ($baseSql)
              |), w AS (
              |  SELECT event_id, a, rn,
              |    last_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    first_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    last_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
              |    first_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
              |  FROM base)
              |SELECT event_id,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NOT NULL AND nv IS NOT NULL
              |            AND (rn - pp <= 2 OR np - rn <= 2) THEN
              |         CAST(${Q.dec2Sql("pv")} * (np - pp)
              |              + (${Q.dec2Sql("nv")} - ${Q.dec2Sql("pv")}) * (rn - pp) AS DOUBLE)
              |         / (np - pp)
              |  END AS interp_inside,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NULL AND nv IS NOT NULL AND np - rn <= 2 THEN nv
              |       WHEN nv IS NULL AND pv IS NOT NULL AND rn - pp <= 2 THEN pv
              |  END AS fill_outside
              |FROM w""".stripMargin)),

    // interpolate(method='nearest'): the closer known NEIGHBOR VALUE by
    // row distance (scipy interp1d 'nearest'; halfway takes the left).
    QueryDef("interpolate_nearest",
      (s, d) => {
        val rn = row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
        val base = withA(s, d).withColumn("rn", rn)
        val w = Window.partitionBy("user_id").orderBy("rn")
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("a"), ignoreNulls = true).over(before)
        val nv = first(col("a"), ignoreNulls = true).over(after)
        val pp = last(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(before)
        val np = first(when(col("a").isNotNull, col("rn")), ignoreNulls = true).over(after)
        val pick = when(col("a").isNotNull, col("a"))
          .when(pv.isNull, nv)
          .when(nv.isNull, pv)
          .when(col("rn") - pp <= np - col("rn"), pv)
          .otherwise(nv)
        base.select(col("event_id"), pick.as("interp"))
      },
      Some(s"""WITH base AS (
              |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |  FROM ($baseSql)
              |), w AS (
              |  SELECT event_id, a, rn,
              |    last_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    first_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    last_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
              |    first_value(CASE WHEN a IS NOT NULL THEN rn END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY rn
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
              |  FROM base)
              |SELECT event_id,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NULL THEN nv
              |       WHEN nv IS NULL THEN pv
              |       WHEN rn - pp <= np - rn THEN pv
              |       ELSE nv END AS interp
              |FROM w""".stripMargin)),

    // interpolate(method='polynomial', order=2) (reference
    // core/missing.py:111 method table): per-gap LOCAL quadratic —
    // Lagrange through the two nearest known points before the gap and
    // the first after, the bounded-work distributed reading of the
    // scipy global fit (documented deviation: scipy fits through all
    // points; a local fit is the only O(1)-state form a 100 TB scan
    // admits). Degrades to linear when only one point precedes, pads
    // with the previous value at the tail, stays null at the head —
    // matching interpolate_linear's documented edges. The Lagrange
    // numerator is EXACT: decimal values × integer position products
    // over the common integer denominator; the single final division
    // is the only IEEE op, identical in both engines.
    QueryDef("interpolate_poly",
      (s, d) => {
        val rn = row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
        val base = withA(s, d).withColumn("rn", rn.cast("long"))
        val w = Window.partitionBy("user_id").orderBy("rn")
        val vrn = when(col("a").isNotNull, col("rn"))
        val pv = lag(col("a"), 1, null, ignoreNulls = true).over(w)
        val pp = lag(vrn, 1, null, ignoreNulls = true).over(w)
        val pv2 = lag(col("a"), 2, null, ignoreNulls = true).over(w)
        val pp2 = lag(vrn, 2, null, ignoreNulls = true).over(w)
        val nv = lead(col("a"), 1, null, ignoreNulls = true).over(w)
        val np = lead(vrn, 1, null, ignoreNulls = true).over(w)
        val x = col("rn")
        val lin = (Q.dec2(pv) * (np - pp) + (Q.dec2(nv) - Q.dec2(pv)) * (x - pp))
          .cast("double") / (np - pp)
        val num = Q.dec2(pv2) * ((pp - np) * (x - pp) * (x - np)) -
          Q.dec2(pv) * ((pp2 - np) * (x - pp2) * (x - np)) +
          Q.dec2(nv) * ((pp2 - pp) * (x - pp2) * (x - pp))
        val den = (pp2 - pp) * (pp2 - np) * (pp - np)
        val quad = num.cast("double") / den
        val interp = when(col("a").isNotNull, col("a"))
          .when(pv.isNull, lit(null))
          .when(nv.isNull, pv)
          .when(pv2.isNull, lin)
          .otherwise(quad)
        base.select(col("event_id"), interp.as("interp"))
      },
      Some(s"""WITH base AS (
              |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |  FROM ($baseSql)
              |), w AS (
              |  SELECT event_id, a, rn,
              |    lag(a, 1 IGNORE NULLS) OVER win AS pv,
              |    lag(CASE WHEN a IS NOT NULL THEN rn END, 1 IGNORE NULLS) OVER win AS pp,
              |    lag(a, 2 IGNORE NULLS) OVER win AS pv2,
              |    lag(CASE WHEN a IS NOT NULL THEN rn END, 2 IGNORE NULLS) OVER win AS pp2,
              |    lead(a, 1 IGNORE NULLS) OVER win AS nv,
              |    lead(CASE WHEN a IS NOT NULL THEN rn END, 1 IGNORE NULLS) OVER win AS np
              |  FROM base
              |  WINDOW win AS (PARTITION BY user_id ORDER BY rn))
              |SELECT event_id,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NULL THEN NULL
              |       WHEN nv IS NULL THEN pv
              |       WHEN pv2 IS NULL THEN
              |         CAST(${Q.dec2Sql("pv")} * (np - pp)
              |              + (${Q.dec2Sql("nv")} - ${Q.dec2Sql("pv")}) * (rn - pp) AS DOUBLE)
              |         / (np - pp)
              |       ELSE
              |         CAST(${Q.dec2Sql("pv2")} * ((pp - np) * (rn - pp) * (rn - np))
              |              - ${Q.dec2Sql("pv")} * ((pp2 - np) * (rn - pp2) * (rn - np))
              |              + ${Q.dec2Sql("nv")} * ((pp2 - pp) * (rn - pp2) * (rn - pp)) AS DOUBLE)
              |         / ((pp2 - pp) * (pp2 - np) * (pp - np))
              |  END AS interp
              |FROM w""".stripMargin)),

    // fillna(axis=1, method='ffill'): fill ACROSS columns left→right —
    // a coalesce cascade over the column order, scan-local.
    QueryDef("fillna_axis1",
      (s, d) => {
        val a = when(col("value") < 50, lit(null)).otherwise(col("value"))
        val b = when(col("value") % 7 < 2, lit(null)).otherwise(col("value") * 2)
        val c = when(col("value") % 11 < 3, lit(null)).otherwise(col("value") + 1)
        T.events(s, d).select(col("event_id"),
          a.as("a"), coalesce(b, a).as("b"), coalesce(c, b, a).as("c"))
      },
      Some("""WITH t AS (SELECT event_id,
             |    CASE WHEN value < 50 THEN NULL ELSE value END AS a,
             |    CASE WHEN value % 7 < 2 THEN NULL ELSE value * 2 END AS b,
             |    CASE WHEN value % 11 < 3 THEN NULL ELSE value + 1 END AS c
             |  FROM events)
             |SELECT event_id, a, coalesce(b, a) AS b, coalesce(c, b, a) AS c
             |FROM t""".stripMargin)),

    // interpolate(method='time'): weights by elapsed time between the
    // surrounding known points, not by row position.
    QueryDef("interpolate_time",
      (s, d) => {
        val base = withA(s, d)
          .withColumn("t", expr("unix_micros(ts) div 1000000"))
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val before = w.rowsBetween(Window.unboundedPreceding, 0)
        val after = w.rowsBetween(0, Window.unboundedFollowing)
        val pv = last(col("a"), ignoreNulls = true).over(before)
        val nv = first(col("a"), ignoreNulls = true).over(after)
        val pt = last(when(col("a").isNotNull, col("t")), ignoreNulls = true).over(before)
        val nt = first(when(col("a").isNotNull, col("t")), ignoreNulls = true).over(after)
        val interp = when(col("a").isNotNull, col("a"))
          .when(pv.isNull, lit(null))
          .when(nv.isNull, pv)
          .when(nt === pt, pv) // zero time gap: carry (no div-by-zero)
          .otherwise(
            (Q.dec2(pv) * (nt - pt) + (Q.dec2(nv) - Q.dec2(pv)) * (col("t") - pt))
              .cast("double") / (nt - pt))
        base.select(col("event_id"), interp.as("interp"))
      },
      Some(s"""WITH base AS (
              |  SELECT *, epoch_us(ts) // 1000000 AS t FROM ($baseSql)
              |), w AS (
              |  SELECT event_id, a, t,
              |    last_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    first_value(a IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    last_value(CASE WHEN a IS NOT NULL THEN t END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY t, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
              |    first_value(CASE WHEN a IS NOT NULL THEN t END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY t, event_id
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
              |  FROM base)
              |SELECT event_id,
              |  CASE WHEN a IS NOT NULL THEN a
              |       WHEN pv IS NULL THEN NULL
              |       WHEN nv IS NULL THEN pv
              |       WHEN nt = pt THEN pv
              |       ELSE CAST(${Q.dec2Sql("pv")} * (nt - pt)
              |                 + (${Q.dec2Sql("nv")} - ${Q.dec2Sql("pv")}) * (t - pt) AS DOUBLE)
              |            / (nt - pt) END AS interp
              |FROM w""".stripMargin)),

    QueryDef("replace_map",
      (s, d) => T.events(s, d).select(col("event_id"),
        MissingOps.replaceValues(col("event_type"),
          Seq("click" -> "tap", "view" -> "impression")).as("etype")),
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'click' THEN 'tap'
             |                  WHEN 'view' THEN 'impression'
             |                  ELSE event_type END AS etype
             |FROM events""".stripMargin)),

    QueryDef("isna_flags",
      (s, d) => withA(s, d).select(col("event_id"),
        col("a").isNull.as("is_na"), col("a").isNotNull.as("not_na")),
      Some(s"SELECT event_id, a IS NULL AS is_na, a IS NOT NULL AS not_na FROM ($baseSql)"))
  )
}

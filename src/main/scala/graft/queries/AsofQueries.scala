package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.{AsofOps, SelectionOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** merge_asof family (SURVEY §2.3; reference merge.py:229). 'Trades' =
  * click events, 'quotes' = view events, matched per user over time.
  * DuckDB's ASOF JOIN is the oracle.
  *
  * Quotes are deduplicated to one row per (user_id, ts) — keep last by
  * event_id — before matching, pinning pandas' take-the-last semantics
  * and DuckDB's otherwise-arbitrary tie choice to the same row.
  */
object AsofQueries extends QueryModule {

  private val T = Tables

  private def trades(s: SparkSession, d: String): DataFrame =
    T.events(s, d).filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))

  private def quotes(s: SparkSession, d: String): DataFrame =
    SelectionOps.dropDuplicates(
      T.events(s, d).filter(col("event_type") === "view"),
      Seq("user_id", "ts"), "last", Seq(col("event_id")))
      .select(col("user_id"), col("ts"), col("value").as("q_value"))

  private val tradesSql =
    "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'"
  private val quotesSql =
    """SELECT user_id, ts, value AS q_value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, ts
      |                               ORDER BY event_id DESC) AS rn
      |  FROM events WHERE event_type = 'view') WHERE rn = 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Backward asof through the CUSTOM physical operator (AsofJoinExec:
    // LogicalPlan + Strategy + two-pointer merge exec — the engine's
    // default backward path, ~25% faster than the window form and
    // differential-tested against DuckDB ASOF JOIN like every query).
    QueryDef("asof_backward_by",
      (s, d) => graft.plans.AsofJoinPlan.asof(
          trades(s, d), quotes(s, d), "ts", Seq("user_id"), Seq("q_value"))
        .select("event_id", "q_value"),
      Some(s"""WITH t AS ($tradesSql), q AS ($quotesSql)
              |SELECT t.event_id, q.q_value
              |FROM t ASOF LEFT JOIN q
              |ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin)),

    // The union/window formulation of the same operator (kept as the
    // fallback path: it also serves forward/nearest/tolerance).
    QueryDef("asof_window_backward",
      (s, d) => AsofOps.asof(trades(s, d), quotes(s, d), "ts", Seq("user_id"),
          Seq("q_value"), "backward")
        .select("event_id", "q_value"),
      Some(s"""WITH t AS ($tradesSql), q AS ($quotesSql)
              |SELECT t.event_id, q.q_value
              |FROM t ASOF LEFT JOIN q
              |ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin)),

    // Forward through the custom exec too (descending-order mirror of
    // the same two-pointer merge); the window form still backs
    // nearest/tolerance composition (asof_nearest).
    QueryDef("asof_forward_by",
      (s, d) => graft.plans.AsofJoinPlan.asof(
          trades(s, d), quotes(s, d), "ts", Seq("user_id"), Seq("q_value"),
          direction = "forward")
        .select("event_id", "q_value"),
      Some(s"""WITH t AS ($tradesSql), q AS ($quotesSql)
              |SELECT t.event_id, q.q_value
              |FROM t ASOF LEFT JOIN q
              |ON t.user_id = q.user_id AND t.ts <= q.ts""".stripMargin)),

    QueryDef("asof_tolerance",
      (s, d) => AsofOps.asof(trades(s, d), quotes(s, d), "ts", Seq("user_id"),
          Seq("q_value"), "backward", allowExact = true,
          toleranceMicros = Some(600000000L))
        .select("event_id", "q_value"),
      Some(s"""WITH t AS ($tradesSql), q AS ($quotesSql)
              |SELECT t.event_id,
              |  CASE WHEN t.ts - q.ts <= INTERVAL '600 seconds' THEN q.q_value END AS q_value
              |FROM t ASOF LEFT JOIN q
              |ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin)),

    // nearest through the CUSTOM exec (r3): the ascending two-pointer's
    // stopped row IS the forward candidate, so nearest costs one extra
    // compare at emit — no second pass, no self-join (the two-pass
    // window composition remains in AsofOps.asofNearest and the spec
    // pins the differential).
    QueryDef("asof_nearest",
      (s, d) => graft.plans.AsofJoinPlan.asof(trades(s, d), quotes(s, d),
          "ts", Seq("user_id"), Seq("q_value"), direction = "nearest")
        .select("event_id", "q_value"),
      Some(s"""WITH t AS ($tradesSql), q AS ($quotesSql),
              |b AS (SELECT t.event_id, t.ts, q.ts AS b_on, q.q_value AS b_val
              |      FROM t ASOF LEFT JOIN q ON t.user_id = q.user_id AND t.ts >= q.ts),
              |f AS (SELECT t.event_id, q.ts AS f_on, q.q_value AS f_val
              |      FROM t ASOF LEFT JOIN q ON t.user_id = q.user_id AND t.ts <= q.ts)
              |SELECT b.event_id,
              |  CASE WHEN b_on IS NOT NULL AND (f_on IS NULL OR (b.ts - b_on) <= (f_on - b.ts))
              |       THEN b_val ELSE f_val END AS q_value
              |FROM b JOIN f USING (event_id)""".stripMargin))
  )
}

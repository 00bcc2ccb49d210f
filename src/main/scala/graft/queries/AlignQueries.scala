package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.core.PFrame
import org.apache.spark.sql.functions._

/** PFrame alignment semantics + pivot margins + offset-window selection
  * (SURVEY §1.4 alignment, §2.4 pivot margins, §2.10 first('3D')). */
object AlignQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    // s1 + s2 with automatic index alignment: the implicit outer join
    // every reference binary op performs (pandas/core/ops.py:948).
    QueryDef("aligned_add",
      (s, d) => {
        val clicks = PFrame(
          T.events(s, d).filter(col("event_type") === "click")
            .groupBy("user_id").agg(dsum(col("value")).as("v")),
          indexCols = Seq("user_id"))
        val views = PFrame(
          T.events(s, d).filter(col("event_type") === "view")
            .groupBy("user_id").agg(dsum(col("value")).as("v")),
          indexCols = Seq("user_id"))
        clicks.plus(views).df
      },
      Some("""WITH c AS (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
             |          FROM events WHERE event_type = 'click' GROUP BY user_id),
             |     v AS (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
             |          FROM events WHERE event_type = 'view' GROUP BY user_id)
             |SELECT coalesce(c.user_id, v.user_id) AS user_id, c.v + v.v AS v
             |FROM c FULL OUTER JOIN v ON c.user_id = v.user_id""".stripMargin)),

    // pivot_table(margins=True): the All row/column via rollup-style
    // unions (reference reshape/pivot.py:131 _add_margins).
    QueryDef("pivot_margins",
      (s, d) => {
        val o = T.orders(s, d)
        // counts per (prio incl. All) × status, then an All column
        val byBoth = o.groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("cnt"))
        val allPrio = o.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt")).withColumn("o_orderpriority", lit("All"))
        val long = byBoth.unionByName(allPrio.select("o_orderpriority", "o_orderstatus", "cnt"))
        val p = long.groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(first(col("cnt")))
        p.select(col("o_orderpriority").as("prio"),
          col("F"), col("O"), col("P"),
          (col("F") + col("O") + col("P")).as("All"))
      },
      Some("""SELECT coalesce(o_orderpriority, 'All') AS prio,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P,
             |  count(*) AS "All"
             |FROM orders GROUP BY ROLLUP (o_orderpriority)""".stripMargin)),

    // first('3D'): rows within 3 days of the frame's start
    // (reference generic.py:7818). Window-min over an empty partition
    // is a scalar agg broadcast — no shuffle of the fact rows.
    QueryDef("first_3d",
      (s, d) => {
        val mn = T.events(s, d).agg(min(col("ts")).as("mn"))
        T.events(s, d).crossJoin(broadcast(mn))
          .filter(col("ts") < col("mn") + expr("interval 3 days"))
          .select("event_id")
      },
      Some("""SELECT event_id FROM events
             |WHERE ts < (SELECT min(ts) FROM events) + INTERVAL '3 days'""".stripMargin)),

    QueryDef("last_3d",
      (s, d) => {
        val mx = T.events(s, d).agg(max(col("ts")).as("mx"))
        T.events(s, d).crossJoin(broadcast(mx))
          .filter(col("ts") > col("mx") - expr("interval 3 days"))
          .select("event_id")
      },
      Some("""SELECT event_id FROM events
             |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL '3 days'""".stripMargin))
  )
}

package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.core.PFrame
import org.apache.spark.sql.Column
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

    // DataFrame.corrwith(other): per-column Pearson between two frames
    // aligned on the index (reference frame.py:7256) — one join + one
    // aggregate computing every exact cent power/cross sum, the matrix
    // cells are projections (same one-pass shape as corr_cov_matrix).
    QueryDef("corrwith_cols",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val d38 = DecimalType(38, 0)
        val ev = T.events(s, d)
        val a = ev.select(col("event_id"),
          (dec2(col("value")) * 100).cast("long").as("a_x"),
          (get_json_object(col("props"), "$.k").cast("long") * 100).as("a_y"))
        val b = ev.select(col("event_id"),
          (dec2(col("value")) * 200).cast("long").as("b_x"),
          expr("unix_micros(ts) div 1000000 - 1704067200").as("b_y"))
        val j = a.join(b, "event_id")
        def corrOf(x: String, y: String) = {
          val n = count(lit(1)).cast(d38)
          val sx = sum(col(x).cast(d38)); val sy = sum(col(y).cast(d38))
          val sxy = sum((col(x) * col(y)).cast(d38))
          val sxx = sum((col(x) * col(x)).cast(d38))
          val syy = sum((col(y) * col(y)).cast(d38))
          (n, sx, sy, sxy, sxx, syy)
        }
        val (n, sx, sy, sxy, sxx, syy) = corrOf("a_x", "b_x")
        val (n2, sx2, sy2, sxy2, sxx2, syy2) = corrOf("a_y", "b_y")
        val agg = j.agg(n.as("n"), sx.as("sx"), sy.as("sy"), sxy.as("sxy"),
          sxx.as("sxx"), syy.as("syy"), sx2.as("sx2"), sy2.as("sy2"),
          sxy2.as("sxy2"), sxx2.as("sxx2"), syy2.as("syy2"))
        def cell(nc: Column, sxc: Column, syc: Column, sxyc: Column,
            sxxc: Column, syyc: Column) =
          (nc * sxyc - sxc * syc).cast("double") /
            (sqrt((nc * sxxc - sxc * sxc).cast("double")) *
             sqrt((nc * syyc - syc * syc).cast("double")))
        agg.select(lit("x").as("column"),
            cell(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy")).as("corr"))
          .unionByName(agg.select(lit("y").as("column"),
            cell(col("n"), col("sx2"), col("sy2"), col("sxy2"), col("sxx2"), col("syy2")).as("corr")))
      },
      Some("""WITH a AS (SELECT event_id,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS a_x,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) * 100 AS a_y
             |  FROM events),
             |b AS (SELECT event_id,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 200 AS BIGINT) AS b_x,
             |    epoch_us(ts) // 1000000 - 1704067200 AS b_y
             |  FROM events),
             |j AS (SELECT * FROM a JOIN b USING (event_id)),
             |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(a_x AS HUGEINT)) AS sx, sum(CAST(b_x AS HUGEINT)) AS sy,
             |    sum(CAST(a_x AS HUGEINT) * CAST(b_x AS HUGEINT)) AS sxy,
             |    sum(CAST(a_x AS HUGEINT) * CAST(a_x AS HUGEINT)) AS sxx,
             |    sum(CAST(b_x AS HUGEINT) * CAST(b_x AS HUGEINT)) AS syy,
             |    sum(CAST(a_y AS HUGEINT)) AS sx2, sum(CAST(b_y AS HUGEINT)) AS sy2,
             |    sum(CAST(a_y AS HUGEINT) * CAST(b_y AS HUGEINT)) AS sxy2,
             |    sum(CAST(a_y AS HUGEINT) * CAST(a_y AS HUGEINT)) AS sxx2,
             |    sum(CAST(b_y AS HUGEINT) * CAST(b_y AS HUGEINT)) AS syy2
             |  FROM j)
             |SELECT 'x' AS "column",
             |  sign(n*sxy - sx*sy) * CAST(abs(n*sxy - sx*sy) AS DOUBLE) /
             |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
             |FROM g
             |UNION ALL SELECT 'y',
             |  sign(n*sxy2 - sx2*sy2) * CAST(abs(n*sxy2 - sx2*sy2) AS DOUBLE) /
             |    (sqrt(CAST(n*sxx2 - sx2*sx2 AS DOUBLE)) * sqrt(CAST(n*syy2 - sy2*sy2 AS DOUBLE)))
             |FROM g""".stripMargin)),

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

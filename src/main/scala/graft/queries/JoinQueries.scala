package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.core.PFrame
import graft.operators.JoinOps
import org.apache.spark.sql.functions._

/** Join family queries (SURVEY §2.3). Catalyst picks the physical join;
  * the dimension sides here (customer, nation, aggregated counts) are
  * broadcast-sized, so the expected plans are BroadcastHashJoin with the
  * fact table streamed — verified in the scale audit.
  */
object JoinQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    QueryDef("join_inner",
      (s, d) => JoinOps.merge(
        T.orders(s, d).select(col("o_custkey").as("custkey"),
          col("o_orderkey"), col("o_totalprice")),
        T.customer(s, d).select(col("c_custkey").as("custkey"),
          col("c_name"), col("c_acctbal")),
        Seq("custkey"), "inner"),
      Some("""SELECT o_custkey AS custkey, o_orderkey, o_totalprice, c_name, c_acctbal
             |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // Overlapping non-key column 'val' → pandas suffixes _x/_y.
    QueryDef("join_left_suffixes",
      (s, d) => JoinOps.merge(
        T.customer(s, d).select(col("c_custkey").as("custkey"), col("c_acctbal").as("val")),
        T.orders(s, d).filter(col("o_totalprice") > 450000)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).cast("double").as("val")),
        Seq("custkey"), "left"),
      Some("""SELECT c_custkey AS custkey, c_acctbal AS val_x, cnt AS val_y
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS cnt
             |  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey
             |) ON c_custkey = o_custkey""".stripMargin)),

    QueryDef("join_outer_indicator",
      (s, d) => JoinOps.merge(
        T.customer(s, d).filter(col("c_acctbal") > 9900)
          .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust")),
        T.supplier(s, d).filter(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp")),
        Seq("nationkey"), "outer", indicator = true),
      Some("""SELECT coalesce(a.nationkey, b.nationkey) AS nationkey, n_cust, n_supp,
             |  CASE WHEN a.nationkey IS NOT NULL AND b.nationkey IS NOT NULL THEN 'both'
             |       WHEN a.nationkey IS NOT NULL THEN 'left_only'
             |       ELSE 'right_only' END AS _merge
             |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |      FROM customer WHERE c_acctbal > 9900 GROUP BY 1) a
             |FULL OUTER JOIN
             |     (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) b
             |USING (nationkey)""".stripMargin)),

    QueryDef("join_semi",
      (s, d) => T.customer(s, d).join(
          T.orders(s, d).filter(col("o_totalprice") > 500000),
          col("c_custkey") === col("o_custkey"), "leftsemi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 500000)""".stripMargin)),

    QueryDef("join_anti",
      (s, d) => T.customer(s, d).join(
          T.orders(s, d).filter(col("o_totalprice") > 500000),
          col("c_custkey") === col("o_custkey"), "leftanti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 500000)""".stripMargin)),

    QueryDef("join_cross",
      (s, d) => JoinOps.cross(
          T.region(s, d).select(col("r_name").as("r1")),
          T.region(s, d).select(col("r_name").as("r2")))
        .select(concat_ws("-", col("r1"), col("r2")).as("pair")),
      Some("""SELECT a.r_name || '-' || b.r_name AS pair
             |FROM region a CROSS JOIN region b""".stripMargin)),

    QueryDef("join_multi_key",
      (s, d) => JoinOps.merge(
        T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        T.lineitem(s, d).filter(col("l_discount") >= 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        Seq("l_orderkey", "l_linenumber"), "inner"),
      Some("""SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice
             |FROM lineitem a JOIN (
             |  SELECT * FROM lineitem WHERE l_discount >= 0.05) b
             |ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber""".stripMargin)),

    // TPC-H Q3 shape: two broadcast dims onto the fact scan, hash-agg,
    // distributed top-k. The bench headline join.
    QueryDef("q3_join_topk",
      (s, d) => {
        val cutoff = lit("1998-01-01").cast("timestamp")
        val cust = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ords = T.orders(s, d).filter(col("o_orderdate") < cutoff)
        val li = T.lineitem(s, d).filter(col("l_shipdate") > cutoff)
        // r19: revenue accumulates exact long cents×bp products in
        // DECIMAL(38,0) with one rescale per group (see Q.dsum) — same
        // exact value, no per-row decimal multiply
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val pc = Q.cents(col("l_extendedprice"))
        val dc = Q.cents(col("l_discount"))
        cust.join(ords, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg((sum((pc * (lit(100L) - dc)).cast(d38)) / lit(10000))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, o_orderdate,
              |  CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${dec2Sql("l_discount")})) AS DOUBLE) AS revenue
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |  AND l_shipdate > TIMESTAMP '1998-01-01'
              |GROUP BY o_orderkey, o_orderdate
              |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // combine_first: aligned coalesce through the PFrame index machinery
    // (reference frame.py:5138).
    QueryDef("combine_first",
      (s, d) => {
        val left = PFrame(
          T.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_totalprice").as("val")),
          indexCols = Seq("o_orderkey"))
        val right = PFrame(
          T.orders(s, d).select(col("o_orderkey"), lit(-1.0).as("val")),
          indexCols = Seq("o_orderkey"))
        left.combineFirst(right).df
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE -1.0 END AS val
             |FROM orders""".stripMargin)),

    // update(other): other's non-null values overwrite in place, frame
    // shape unchanged (reference frame.py:5217) — the aligned coalesce
    // in the OTHER direction from combine_first. The patch frame is
    // small → broadcast left join, the base never shuffles.
    QueryDef("frame_update",
      (s, d) => {
        val base = PFrame(
          T.orders(s, d).select(col("o_orderkey"), col("o_totalprice").as("val"),
            col("o_orderpriority").as("prio")),
          indexCols = Seq("o_orderkey"))
        val patch = PFrame(
          broadcast(T.orders(s, d).filter(col("o_orderstatus") === "P")
            .select(col("o_orderkey"), lit(0.0).as("val"))),
          indexCols = Seq("o_orderkey"))
        base.update(patch).df
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'P' THEN 0.0 ELSE o_totalprice END AS val,
             |  o_orderpriority AS prio
             |FROM orders""".stripMargin)),

    // combine(func): aligned elementwise combine with a caller function
    // (reference frame.py:4970) — here func = greatest with null-propagate.
    QueryDef("frame_combine",
      (s, d) => {
        val f = PFrame(
          T.orders(s, d).filter(col("o_orderstatus") =!= "P")
            .select(col("o_orderkey"), col("o_totalprice").as("val")),
          indexCols = Seq("o_orderkey"))
        val o = PFrame(
          T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey"), (dec2(col("o_totalprice")) * 2)
              .cast("double").as("val")),
          indexCols = Seq("o_orderkey"))
        f.combine(o, (a, b) => greatest(a, b)).df
      },
      // greatest() ignores nulls in BOTH engines (verified), giving the
      // one-sided passthrough pandas' combine gets from fill_value.
      Some("""WITH f AS (SELECT o_orderkey, o_totalprice AS val FROM orders
             |           WHERE o_orderstatus <> 'P'),
             |     o AS (SELECT o_orderkey,
             |             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE) AS val
             |           FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT coalesce(f.o_orderkey, o.o_orderkey) AS o_orderkey,
             |  greatest(f.val, o.val) AS val
             |FROM f FULL OUTER JOIN o ON f.o_orderkey = o.o_orderkey""".stripMargin)),

    // merge_ordered + ffill (reference merge.py:131 _OrderedMerge). The
    // keyless global fill runs through DistScan.withGlobalFfill —
    // bucket-local last-ignoreNulls + driver-carried seeds — so even
    // the no-group form never needs a single-partition window.
    QueryDef("merge_ordered_ffill",
      (s, d) => {
        import graft.operators.DistScan
        val f = T.orders(s, d).filter(col("o_orderstatus") === "F")
          .groupBy(col("o_orderdate").as("day")).agg(count(lit(1)).as("n_f"))
        val p = T.orders(s, d).filter(col("o_orderstatus") === "P")
          .groupBy(col("o_orderdate").as("day")).agg(count(lit(1)).as("n_p"))
        DistScan.withGlobalFfill(
          f.join(p, Seq("day"), "full_outer"),
          unix_micros(col("day").cast("timestamp")), Seq(col("day")),
          Seq("n_f", "n_p"), buckets = 8)
      },
      Some("""WITH f AS (SELECT o_orderdate AS day, count(*) AS n_f
             |          FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
             |     p AS (SELECT o_orderdate AS day, count(*) AS n_p
             |          FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
             |SELECT day,
             |  last_value(n_f IGNORE NULLS) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_f,
             |  last_value(n_p IGNORE NULLS) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_p
             |FROM f FULL OUTER JOIN p USING (day)""".stripMargin)),

    // merge(validate='1:m') (reference: merge.py:1554 _validate —
    // uniqueness asserted on the '1' side before joining, ValueError if
    // violated). The gate emits both side checks — orders IS unique on
    // o_orderkey, lineitem is NOT on l_orderkey (so '1:m' holds and
    // 'm:m' is what the right side really is) — plus the validated
    // join's row count, so the assertion AND the join it guards are
    // both pinned. Each validateKeys is one map-side-combined count
    // aggregate with an early-out emptiness check, never a collect.
    QueryDef("merge_validate_1m",
      (s, d) => {
        val o = T.orders(s, d)
        val l = T.lineitem(s, d)
        val leftUnique = JoinOps.validateKeys(o, Seq("o_orderkey"), unique = true)
        val rightUnique = JoinOps.validateKeys(l, Seq("l_orderkey"), unique = true)
        require(leftUnique, "merge validate='1:m': left keys are not unique")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("n_join"))
          .select(lit(leftUnique).as("left_unique"),
            lit(rightUnique).as("right_unique"), col("n_join"))
      },
      Some("""SELECT TRUE AS left_unique, FALSE AS right_unique,
             |  CAST((SELECT count(*) FROM orders JOIN lineitem
             |        ON o_orderkey = l_orderkey) AS BIGINT) AS n_join""".stripMargin))
  )
}

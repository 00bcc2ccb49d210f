package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.SetOps
import org.apache.spark.sql.functions._

/** Set operations / concat (SURVEY §2.7; reference:
  * pandas/core/reshape/concat.py:24 concat, _Concatenator :232;
  * pandas/core/indexes/base.py:2767-2980 union/intersection/difference).
  */
object SetOpQueries extends QueryModule {

  private val T = Tables

  def defs: Seq[QueryDef] = Seq(

    // concat(axis=0, join='outer'): by-name union, missing cols null-padded.
    QueryDef("concat_outer",
      (s, d) => {
        val a = T.events(s, d).select("event_id", "user_id")
        val b = T.events(s, d).select("event_id", "value")
        SetOps.concatOuter(Seq(a, b))
      },
      Some("""SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value FROM events
             |UNION ALL
             |SELECT event_id, CAST(NULL AS BIGINT) AS user_id, value FROM events""".stripMargin)),

    QueryDef("concat_inner",
      (s, d) => {
        val a = T.events(s, d).select("event_id", "user_id", "value")
        val b = T.events(s, d).filter(col("event_type") === "click")
          .select("event_id", "user_id")
        SetOps.concatInner(Seq(a, b))
      },
      Some("""SELECT event_id, user_id FROM events
             |UNION ALL
             |SELECT event_id, user_id FROM events WHERE event_type = 'click'""".stripMargin)),

    // concat(keys=): provenance tag column (long form of pandas keys).
    QueryDef("concat_keys",
      (s, d) => SetOps.concatKeys(Seq(
          "cust" -> T.customer(s, d).select(col("c_custkey").as("key"), col("c_acctbal").as("bal")),
          "supp" -> T.supplier(s, d).select(col("s_suppkey").as("key"), col("s_acctbal").as("bal"))),
        "src"),
      Some("""SELECT c_custkey AS key, c_acctbal AS bal, 'cust' AS src FROM customer
             |UNION ALL
             |SELECT s_suppkey AS key, s_acctbal AS bal, 'supp' AS src FROM supplier""".stripMargin)),

    QueryDef("intersect_nations",
      (s, d) => SetOps.intersection(
        T.customer(s, d).select(col("c_nationkey").as("nationkey")),
        T.supplier(s, d).select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin)),

    QueryDef("except_parts",
      (s, d) => SetOps.difference(
        T.part(s, d).select(col("p_partkey").as("partkey")),
        T.lineitem(s, d).filter(col("l_quantity") === 1)
          .select(col("l_partkey").as("partkey"))),
      Some("""SELECT p_partkey AS partkey FROM part
             |EXCEPT
             |SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity = 1""".stripMargin)),

    QueryDef("symdiff_users",
      (s, d) => {
        val early = col("ts") < lit("2024-01-03").cast("timestamp")
        SetOps.symmetricDifference(
          T.events(s, d).filter(col("event_type") === "purchase" && early)
            .select(col("user_id")).distinct(),
          T.events(s, d).filter(col("event_type") === "signup" && early)
            .select(col("user_id")).distinct())
      },
      Some("""(SELECT DISTINCT user_id FROM events
             |   WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
             | EXCEPT
             | SELECT DISTINCT user_id FROM events
             |   WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-03')
             |UNION ALL
             |(SELECT DISTINCT user_id FROM events
             |   WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-03'
             | EXCEPT
             | SELECT DISTINCT user_id FROM events
             |   WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03')""".stripMargin)),

    QueryDef("union_distinct",
      (s, d) => SetOps.union(
        T.events(s, d).filter(col("event_type") === "click").select(col("user_id")),
        T.events(s, d).filter(col("event_type") === "purchase").select(col("user_id"))),
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
             |UNION
             |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // equals (reference: generic.py:1383): exact multiset equality as a
    // distributed action (two exceptAll emptiness checks — no collect).
    // Pinned by emitting the decision for a pair that MUST be equal
    // (same rows, shuffled order and partitioning: equals is order-
    // insensitive) and a pair that must NOT be (one row dropped);
    // DuckDB states the expected constants. A frameEquals that compared
    // by position, ignored duplicates, or degenerated to schema-only
    // fails one of the two booleans.
    QueryDef("frame_equals",
      (s, d) => {
        import s.implicits._
        val n = T.nation(s, d)
        val same = n.orderBy(col("n_name").desc).repartition(7)
        val diff = n.filter(col("n_nationkey") =!= 0)
        Seq((SetOps.frameEquals(n, same), SetOps.frameEquals(n, diff)))
          .toDF("eq_same", "eq_diff")
      },
      Some("SELECT TRUE AS eq_same, FALSE AS eq_diff"))
  )
}

/** DataFrame.compare in tidy long form (SetOps.frameCompare) — one row
  * per differing CELL after key alignment. Planted differences: every
  * 7th customer's balance shifts, every 11th's name is rewritten,
  * every 13th row is missing from the other side (surfacing both
  * compared columns with a NULL other). Both-NULL-equal and
  * missing-row semantics ride the same null-safe comparison the
  * oracle replays with IS NOT DISTINCT FROM; string rendering of the
  * shifted doubles is shortest-round-trip in both engines. */
object FrameCompareQueries extends QueryModule {
  private val T = Tables
  def defs: Seq[QueryDef] = Seq(
    QueryDef("frame_compare",
      (s, d) => {
        val a = T.customer(s, d).select(col("c_custkey").as("k"),
          col("c_name").as("name"), col("c_acctbal").as("bal"))
        val b = a.filter(pmod(col("k"), lit(13)) =!= 0)
          .select(col("k"),
            when(pmod(col("k"), lit(11)) === 0,
              concat(lit("X-"), col("name"))).otherwise(col("name"))
              .as("name"),
            when(pmod(col("k"), lit(7)) === 0, col("bal") + 10)
              .otherwise(col("bal")).as("bal"))
        SetOps.frameCompare(a, b, Seq("k"), Seq("name", "bal"))
      },
      Some("""WITH a AS (SELECT c_custkey AS k, c_name AS name,
             |    c_acctbal AS bal FROM customer),
             |b AS (SELECT k,
             |    CASE WHEN k % 11 = 0 THEN 'X-' || name ELSE name END AS name,
             |    CASE WHEN k % 7 = 0 THEN bal + 10 ELSE bal END AS bal
             |  FROM a WHERE k % 13 <> 0),
             |j AS (SELECT a.k, a.name AS ln, a.bal AS lb,
             |    b.name AS rn, b.bal AS rb, b.k AS bk
             |  FROM a LEFT JOIN b ON a.k = b.k)
             |SELECT k, 'name' AS "column", CAST(ln AS VARCHAR) AS self,
             |  CAST(rn AS VARCHAR) AS other
             |FROM j WHERE bk IS NULL OR NOT (ln IS NOT DISTINCT FROM rn)
             |UNION ALL
             |SELECT k, 'bal', CAST(lb AS VARCHAR), CAST(rb AS VARCHAR)
             |FROM j WHERE bk IS NULL OR NOT (lb IS NOT DISTINCT FROM rb)""".stripMargin))
  )
}

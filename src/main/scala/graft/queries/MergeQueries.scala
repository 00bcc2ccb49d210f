package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.MergeOps
import org.apache.spark.sql.functions._

/** Lake-maintenance merge gates: MERGE upsert, CDC apply-changes,
  * SCD2 dimension versioning (MergeOps). The reference mutates frames
  * in place (pandas/core/frame.py:8765 update,
  * core/indexing.py:707 __setitem__); on immutable columnar storage
  * the same contracts become whole-table rewrite plans, which is what
  * these gates pin — DuckDB replays each rewrite relationally, so a
  * dropped key, a stale version, or a mis-closed interval hash-fails.
  */
object MergeQueries extends QueryModule {

  private val T = Tables

  def defs: Seq[QueryDef] = Seq(

    // MERGE upsert: modified rows for custkey % 3 = 0, inserts keyed
    // beyond the existing range (k + 900000 for custkey % 10 = 0),
    // untouched target rows persist. One anti-join + union — the
    // rewrite phase of a Delta/Iceberg MERGE.
    QueryDef("merge_upsert",
      (s, d) => {
        val t = T.customer(s, d).select(
          col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
        val mods = t.filter(pmod(col("k"), lit(3)) === 0)
          .select(col("k"), concat(lit("u-"), col("k")).as("name"),
            col("bal"))
        val ins = t.filter(pmod(col("k"), lit(10)) === 0)
          .select((col("k") + 900000L).as("k"), col("name"), col("bal"))
        MergeOps.upsert(t, mods.unionByName(ins), Seq("k"))
      },
      Some("""WITH t AS (SELECT c_custkey AS k, c_name AS name,
             |              c_acctbal AS bal FROM customer),
             |src AS (SELECT k, 'u-' || k AS name, bal FROM t WHERE k % 3 = 0
             |        UNION ALL
             |        SELECT k + 900000 AS k, name, bal FROM t WHERE k % 10 = 0)
             |SELECT t.k, t.name, t.bal FROM t
             |WHERE t.k NOT IN (SELECT k FROM src)
             |UNION ALL SELECT k, name, bal FROM src""".stripMargin)),

    // CDC apply-changes: each order is a change event for its customer
    // (seq = o_orderkey, globally unique so latest-wins is exact);
    // custkey % 7 = 0 streams deletes. The latest-wins compaction is a
    // map-side-combinable max(struct(...)) — a hot entity
    // partial-aggregates BEFORE the shuffle — then one anti-join +
    // union. The oracle replays latest-per-key with row_number and the
    // same delete/upsert split.
    QueryDef("cdc_apply_changes",
      (s, d) => {
        val t = T.customer(s, d).select(
          col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
        val ch = T.orders(s, d).select(
          col("o_custkey").as("k"),
          concat(lit("ord-"), col("o_orderkey")).as("name"),
          col("o_totalprice").as("bal"),
          when(pmod(col("o_custkey"), lit(7)) === 0, "D")
            .otherwise("U").as("op"),
          col("o_orderkey").as("seq"))
        MergeOps.applyChanges(t, ch, Seq("k"), "op", "seq")
      },
      Some("""WITH t AS (SELECT c_custkey AS k, c_name AS name,
             |              c_acctbal AS bal FROM customer),
             |c AS (SELECT o_custkey AS k, 'ord-' || o_orderkey AS name,
             |         o_totalprice AS bal,
             |         CASE WHEN o_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
             |         o_orderkey AS seq FROM orders),
             |last AS (SELECT k, name, bal, op FROM (
             |           SELECT *, row_number() OVER (PARTITION BY k
             |             ORDER BY seq DESC) AS rn FROM c) WHERE rn = 1)
             |SELECT k, name, bal FROM t
             |WHERE k NOT IN (SELECT k FROM last)
             |UNION ALL SELECT k, name, bal FROM last WHERE op <> 'D'""".stripMargin)),

    // SCD2 versioning: the customer dim (one open version each, from
    // 2020-01-01) against an update stream with one version per order
    // (update instants made unique per key by deriving them from the
    // globally-unique o_orderkey, so the lead() chain is
    // deterministic). Updated keys close their current row at the
    // FIRST update; intermediate versions chain; the last stays open.
    // Windows are key-partitioned — scale = updates per key.
    QueryDef("scd2_versions",
      (s, d) => {
        val dim = T.customer(s, d).select(
          col("c_custkey").as("k"), col("c_name").as("name"),
          lit("2020-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val upd = T.orders(s, d).select(
          col("o_custkey").as("k"),
          concat(lit("ord-"), col("o_orderkey")).as("name"),
          expr("timestamp'2020-01-02 00:00:00' + " +
            "make_interval(0, 0, 0, 0, 0, 0, o_orderkey)").as("ts"))
        MergeOps.scd2Apply(dim, upd, "k", "ts", Seq("name"))
      },
      Some("""WITH dim AS (SELECT c_custkey AS k, c_name AS name,
             |    TIMESTAMP '2020-01-01' AS valid_from,
             |    CAST(NULL AS TIMESTAMP) AS valid_to FROM customer),
             |u AS (SELECT o_custkey AS k, 'ord-' || o_orderkey AS name,
             |    TIMESTAMP '2020-01-02' + INTERVAL (o_orderkey) SECOND AS ts
             |    FROM orders),
             |v AS (SELECT k, name, ts AS valid_from,
             |    lead(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to FROM u),
             |f AS (SELECT k, min(ts) AS first_ts FROM u GROUP BY k)
             |SELECT d.k, d.name, d.valid_from,
             |  coalesce(f.first_ts, d.valid_to) AS valid_to
             |FROM dim d LEFT JOIN f ON d.k = f.k
             |UNION ALL SELECT k, name, valid_from, valid_to FROM v""".stripMargin)),

    // Incremental materialized-rollup maintenance (insert-only IVM,
    // MergeOps.mergeAggState): the per-customer order rollup is
    // materialized over the FIRST 60% of orders (by orderkey), then
    // the remaining 40% folds in as a delta — one delta aggregation +
    // one full-outer merge, history never rescanned. The oracle is
    // the FULL re-aggregation over all orders: incremental must equal
    // it exactly (exact decimal sums; a float state would drift), so
    // a lost key, a double-counted delta, or a NULL-poisoned merge
    // hash-fails.
    QueryDef("agg_state_merge",
      (s, d) => {
        val ords = T.orders(s, d).select(col("o_orderkey"),
          col("o_custkey").as("k"),
          col("o_totalprice").cast("decimal(12,2)").as("v"))
        val maxKey = ords.agg(max("o_orderkey")).collect()(0).getLong(0)
        val split = maxKey * 3 / 5
        val state = ords.filter(col("o_orderkey") <= split)
          .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("v"))
        val delta = ords.filter(col("o_orderkey") > split)
          .select("k", "v")
        MergeOps.mergeAggState(state, delta, Seq("k"), Seq("v"))
          .select(col("k"), col("cnt"), col("v").cast("double").as("total"))
      },
      Some("""SELECT o_custkey AS k, count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_custkey""".stripMargin))
  )
}

package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.SelectionOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / row-selection family (SURVEY §2.2, §2.6).
  *
  * Reference semantics: boolean-mask selection pandas/core/frame.py:2770,
  * isin frame.py:7639, drop_duplicates frame.py:4451 (keep=first/last/
  * False), nlargest frame.py:4649, head/tail generic.py:4263/4322,
  * where/mask generic.py:8466, dropna frame.py:4302, value_counts
  * algorithms.py:644, astype generic.py:5241.
  */
object SelectionQueries extends QueryModule {

  private val T = Tables

  def defs: Seq[QueryDef] = Seq(

    QueryDef("filter_mask",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_quantity") >= 45 && col("l_discount") <= 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02""".stripMargin)),

    QueryDef("isin_filter",
      (s, d) => T.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select("event_id", "event_type"),
      Some("SELECT event_id, event_type FROM events WHERE event_type IN ('click','error')")),

    QueryDef("between_filter",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-03-31").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'""".stripMargin)),

    // drop_duplicates: one hash shuffle on the subset key, keep pinned by
    // (ts, event_id) — NOT Spark's arbitrary-row dropDuplicates.
    QueryDef("dedup_keep_first",
      (s, d) => SelectionOps.dropDuplicates(T.events(s, d),
          Seq("user_id", "event_type"), "first", Seq(col("ts"), col("event_id")))
        .select("event_id", "user_id", "event_type", "value"),
      Some("""SELECT event_id, user_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |                               ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    QueryDef("dedup_keep_last",
      (s, d) => SelectionOps.dropDuplicates(T.events(s, d),
          Seq("user_id", "event_type"), "last", Seq(col("ts"), col("event_id")))
        .select("event_id", "user_id", "event_type", "value"),
      Some("""SELECT event_id, user_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |                               ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    QueryDef("dedup_keep_none",
      (s, d) => SelectionOps.dropDuplicates(
          T.events(s, d).withColumn("day", date_trunc("DAY", col("ts"))),
          Seq("user_id", "event_type", "day"), "none", Seq(col("ts"), col("event_id")))
        .select("event_id"),
      Some("""SELECT event_id FROM (
             |  SELECT *, count(*) OVER (
             |    PARTITION BY user_id, event_type, date_trunc('day', ts)) AS c
             |  FROM events) WHERE c = 1""".stripMargin)),

    QueryDef("duplicated_rows",
      (s, d) => SelectionOps.duplicated(T.events(s, d),
          Seq("user_id", "event_type"), "first", Seq(col("ts"), col("event_id")))
        .select("event_id"),
      Some("""SELECT event_id FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |                               ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn > 1""".stripMargin)),

    // TakeOrderedAndProject top-k — per-partition heap, no full sort.
    QueryDef("nlargest_orders",
      (s, d) => SelectionOps.nlargest(T.orders(s, d), 20,
          Seq("o_totalprice"), Seq("o_orderkey"))
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // value_counts(bins=4): numeric histogram — cut into equal-width
    // bins over the observed range, then count (reference
    // algorithms.py:581 value_counts with bins → cut + groupby).
    QueryDef("value_counts_bins",
      (s, d) => {
        val stats = T.events(s, d).agg(
          min(col("value")).as("mn"), max(col("value")).as("mx")).collect()(0)
        val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
        val width = (mx - mn) / 4
        // bin = #left-edges strictly below value, clamped to the last bin
        // (pandas puts the max into the top bin, include_lowest bottom)
        val bin = least(greatest(
          floor((col("value") - mn) / width).cast("int"), lit(0)), lit(3))
        T.events(s, d).groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
      },
      Some("""WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
             |SELECT least(greatest(CAST(floor((value - mn) / ((mx - mn) / 4)) AS INT), 0), 3) AS bin,
             |  count(*) AS cnt
             |FROM events, s GROUP BY 1""".stripMargin)),

    // mode() keep-all-ties (pandas mode returns EVERY maximal value;
    // mode_value keeps one): rank over counts, filter rank 1.
    QueryDef("mode_all_ties",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cnt = T.events(s, d).groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("user_id").orderBy(col("cnt").desc)
        cnt.withColumn("rk", rank().over(w)).filter(col("rk") === 1)
          .select("user_id", "event_type", "cnt")
      },
      Some("""SELECT user_id, event_type, cnt FROM (
             |  SELECT user_id, event_type, count(*) AS cnt,
             |    rank() OVER (PARTITION BY user_id ORDER BY count(*) DESC) AS rk
             |  FROM events GROUP BY user_id, event_type) WHERE rk = 1""".stripMargin)),

    // searchsorted: insertion indices as conditional counts — one
    // aggregate pass over the column, no sort (reference series.py:2337).
    QueryDef("searchsorted_prices",
      (s, d) => graft.operators.SelectionOps.searchsorted(
        T.orders(s, d), "o_totalprice", Seq(1000.0, 50000.0, 200000.0)),
      // CAST each sum: DuckDB sum(int) returns HUGEINT (the bpe lesson)
      Some("""SELECT 1000.0 AS probe,
             |  CAST(sum(CASE WHEN o_totalprice < 1000.0 THEN 1 ELSE 0 END) AS BIGINT) AS idx FROM orders
             |UNION ALL SELECT 50000.0,
             |  CAST(sum(CASE WHEN o_totalprice < 50000.0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             |UNION ALL SELECT 200000.0,
             |  CAST(sum(CASE WHEN o_totalprice < 200000.0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders""".stripMargin)),

    // nlargest(keep='all'): ties at the cutoff all survive. r20 (guide
    // §2.4 / the iloc_slice treatment): rank(r) <= 10 over a global
    // order is exactly o_totalprice >= the 10th-largest value (rank =
    // 1 + count of strictly-greater rows), so the threshold comes from
    // a distributed TakeOrderedAndProject(10) + min, the base table is
    // pre-filtered against it (ties at the threshold survive — the
    // keep='all' tail), and the unpartitioned rank window — formerly a
    // serial pass over EVERY order row in one task — numbers only the
    // ~10+ties survivors, whose filtered ranks equal the global ranks
    // because every strictly-greater row also survives. (Assumes the
    // ranked column is non-null, as o_totalprice is; a null-ranked row
    // could only reach rank <= 10 on a sub-10-row table.)
    QueryDef("nlargest_keep_all",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("o_totalprice").desc)
        val thr = T.orders(s, d).select(col("o_totalprice"))
          .orderBy(col("o_totalprice").desc).limit(10)
          .agg(min("o_totalprice").as("__thr"))
        T.orders(s, d)
          .join(broadcast(thr), col("o_totalprice") >= col("__thr"))
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= 10)
          .select("o_orderkey", "o_totalprice", "rk")
      },
      Some("""SELECT o_orderkey, o_totalprice, rk FROM (
             |  SELECT o_orderkey, o_totalprice,
             |    rank() OVER (ORDER BY o_totalprice DESC) AS rk
             |  FROM orders) WHERE rk <= 10""".stripMargin)),

    QueryDef("nsmallest_lineitem",
      (s, d) => SelectionOps.nsmallest(T.lineitem(s, d), 15,
          Seq("l_extendedprice"), Seq("l_orderkey", "l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 15""".stripMargin)),

    QueryDef("head_events",
      (s, d) => SelectionOps.head(T.events(s, d), 25, Seq(col("ts"), col("event_id")))
        .select("event_id", "user_id"),
      Some("SELECT event_id, user_id FROM events ORDER BY ts, event_id LIMIT 25")),

    QueryDef("tail_events",
      (s, d) => SelectionOps.tail(T.events(s, d), 25, Seq(col("ts"), col("event_id")))
        .select("event_id", "user_id"),
      Some("""SELECT event_id, user_id FROM (
             |  SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 25)""".stripMargin)),

    // where/mask: conditional replacement keeping shape.
    QueryDef("where_mask",
      (s, d) => SelectionOps.where(
          T.events(s, d).select("event_id", "event_type", "value"),
          col("event_type") === "error", Seq("value"), lit(-1.0))
        .select("event_id", "value"),
      Some("""SELECT event_id,
             |  CASE WHEN event_type = 'error' THEN value ELSE -1.0 END AS value
             |FROM events""".stripMargin)),

    QueryDef("clip_values",
      (s, d) => T.events(s, d).select(col("event_id"),
        SelectionOps.clip(col("value"), Some(lit(5.0)), Some(lit(100.0))).as("clipped")),
      Some("SELECT event_id, greatest(least(value, 100.0), 5.0) AS clipped FROM events")),

    // dropna over synthesized nulls (source tables are null-free).
    QueryDef("dropna_thresh",
      (s, d) => {
        val e = T.events(s, d)
          .withColumn("a", when(col("value") < 50, lit(null)).otherwise(col("value")))
          .withColumn("b", when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id")))
          .withColumn("c", when(col("event_type") === "view", lit(null)).otherwise(col("event_type")))
        graft.operators.MissingOps.dropnaThresh(e, Seq("a", "b", "c"), 2)
          .select("event_id", "a", "b", "c")
      },
      Some("""SELECT event_id, a, b, c FROM (
             |  SELECT event_id,
             |    CASE WHEN value < 50 THEN NULL ELSE value END AS a,
             |    CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS b,
             |    CASE WHEN event_type = 'view' THEN NULL ELSE event_type END AS c
             |  FROM events)
             |WHERE (CASE WHEN a IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN b IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) >= 2""".stripMargin)),

    QueryDef("dropna_any",
      (s, d) => T.events(s, d)
        .withColumn("a", when(col("value") < 50, lit(null)).otherwise(col("value")))
        .withColumn("b", when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id")))
        .na.drop("any", Seq("a", "b"))
        .select("event_id", "a", "b"),
      Some("""SELECT event_id, a, b FROM (
             |  SELECT event_id,
             |    CASE WHEN value < 50 THEN NULL ELSE value END AS a,
             |    CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS b
             |  FROM events)
             |WHERE a IS NOT NULL AND b IS NOT NULL""".stripMargin)),

    QueryDef("value_counts",
      (s, d) => T.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type")),

    QueryDef("nunique_count",
      (s, d) => T.events(s, d).agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        count(col("event_id")).as("n_rows")),
      Some("""SELECT count(DISTINCT user_id) AS n_users,
             |count(DISTINCT event_type) AS n_types, count(event_id) AS n_rows
             |FROM events""".stripMargin)),

    // astype: integral-valued doubles → int (truncation == rounding here),
    // timestamp → date, int → string.
    QueryDef("astype_cast",
      (s, d) => T.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_linenumber").cast("string").as("ln_str"),
        col("l_shipdate").cast("date").as("ship_date")),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty_int,
             |CAST(l_linenumber AS VARCHAR) AS ln_str, CAST(l_shipdate AS DATE) AS ship_date
             |FROM lineitem""".stripMargin)),

    // sample(frac, seed): engine-specific RNG, so the raw sample has no
    // cross-engine twin — instead the gate compares ENGINE-INDEPENDENT
    // INVARIANTS any correct seeded Bernoulli sampler must satisfy (the
    // same trick that pinned minhash/simhash via clone pairs). Spark
    // emits the measured booleans; DuckDB states the expected constants:
    //   subset_ok        — anti-join of sample vs source is empty (a
    //                      sampler that invents or mangles rows fails);
    //   count_in_bounds  — |sample| within ±6σ of np for the seeded
    //                      binomial (p=0.1; 6σ ≈ 1-in-10⁹ false alarm,
    //                      scale-factor agnostic because n comes from
    //                      the source aggregate, not a constant);
    //   seed_stable      — two draws with the same seed agree exactly
    //                      (id-sum + count of sampled ids equal): the
    //                      reprocessing-reproducibility contract.
    QueryDef("sample_frac",
      (s, d) => {
        val src = T.events(s, d).select("event_id")
        def draw() = src.sample(withReplacement = false, 0.1, 42L)
        val s1 = draw()
        def digest(df: org.apache.spark.sql.DataFrame) = df.agg(
          count(lit(1)).as("k"),
          coalesce(sum(col("event_id")), lit(0L)).as("idsum"))
        val viol = s1.join(src, Seq("event_id"), "left_anti")
          .agg(count(lit(1)).as("v"))
        val bounds = src.agg(count(lit(1)).cast("double").as("n"))
        viol.crossJoin(digest(s1)).crossJoin(
            digest(draw()).select(col("k").as("k2"), col("idsum").as("idsum2")))
          .crossJoin(bounds)
          .select(
            (col("v") === 0).as("subset_ok"),
            (abs(col("k") - col("n") * 0.1) <=
              lit(6.0) * sqrt(col("n") * 0.09)).as("count_in_bounds"),
            (col("k") === col("k2") && col("idsum") === col("idsum2"))
              .as("seed_stable"))
      },
      Some("SELECT TRUE AS subset_ok, TRUE AS count_in_bounds, TRUE AS seed_stable")),

    // sample(n, weights=) (reference: generic.py:4383): distributed
    // Efraimidis–Spirakis A-Res — every row keyed by u^(1/w), keep the
    // n best via TakeOrderedAndProject (one pass, no global sort, no
    // driver-side cdf). Like sample_frac the draw has no cross-engine
    // twin, so the gate pins ENGINE-INDEPENDENT invariants a correct
    // weighted sampler must satisfy:
    //   subset_ok   — sampled rows all exist in the source;
    //   count_exact — exactly n rows come back;
    //   seed_stable — same seed ⇒ identical draw (id-sum + count);
    //   excl_ok     — zero-weight rows are never drawn (pandas excludes
    //                 weight<=0; w = event_id mod 100 plants real zeros);
    //   bias_ok     — the sample's mean weight exceeds the population's
    //                 (E[w|drawn] = E[w²]/E[w] ≈ 66 vs E[w] ≈ 49.5 for
    //                 uniform 0..99 — a wide margin; deterministic
    //                 because the draw is hash-seeded). An unweighted
    //                 sampler passes the first four and fails this one.
    QueryDef("sample_weights",
      (s, d) => {
        import graft.operators.SampleOps
        val src = T.events(s, d).select(col("event_id"),
          pmod(col("event_id"), lit(100)).cast("double").as("w"))
        def draw() = SampleOps.weightedSample(src, 500, "w", "event_id")
        val s1 = draw()
        val agg1 = s1.agg(count(lit(1)).as("k"),
          sum(col("event_id")).as("idsum"),
          min(col("w")).as("minw"), avg(col("w")).as("avgw"))
        val agg2 = draw().agg(count(lit(1)).as("k2"),
          sum(col("event_id")).as("idsum2"))
        val pop = src.agg(avg(col("w")).as("popw"))
        val viol = s1.join(src, Seq("event_id"), "left_anti")
          .agg(count(lit(1)).as("v"))
        viol.crossJoin(agg1).crossJoin(agg2).crossJoin(pop).select(
          (col("v") === 0).as("subset_ok"),
          (col("k") === 500).as("count_exact"),
          (col("k") === col("k2") && col("idsum") === col("idsum2"))
            .as("seed_stable"),
          (col("minw") > 0.0).as("excl_ok"),
          (col("avgw") > col("popw")).as("bias_ok"))
      },
      Some("""SELECT TRUE AS subset_ok, TRUE AS count_exact,
             |  TRUE AS seed_stable, TRUE AS excl_ok, TRUE AS bias_ok""".stripMargin)),

    // sample(n=500) deterministic: the n smallest hash-uniforms — an
    // order-by-hash top-k (TakeOrderedAndProject, no full sort), exact
    // row count, reproducible, and oracle-checkable unlike rand().
    QueryDef("sample_n_hash",
      (s, d) => {
        import graft.operators.SampleOps
        T.events(s, d)
          .orderBy(SampleOps.hashU32(col("event_id"), "n500").asc,
            col("event_id").asc)
          .limit(500).select("event_id")
      },
      Some("""SELECT event_id FROM events
             |ORDER BY CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR) || ':n500'), 1, 8)) AS BIGINT),
             |  event_id
             |LIMIT 500""".stripMargin)),

    // Deterministic md5-hash sampling + train/val/test split: unlike
    // rand()-based sample above this IS oracle-exact (both engines
    // compute the identical md5-derived uniform), and a document's
    // split never depends on cluster layout or reprocessing order —
    // the property a training-data pipeline actually needs.
    QueryDef("hash_sample_split",
      (s, d) => {
        import graft.operators.SampleOps
        // binary-exact fractions: the scanLeft cums (0.75, 0.875, 1.0)
        // are exactly representable, so the oracle thresholds match
        T.events(s, d).select(col("event_id"),
          SampleOps.hashSplit(col("event_id"),
            Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "graft")
            .as("split"),
          (SampleOps.hashU32(col("event_id"), "graft") <
            (0.1 * 4294967296.0).toLong).as("sampled_10pct"))
      },
      Some("""WITH u AS (SELECT event_id,
             |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR) || ':graft'), 1, 8)) AS BIGINT) AS h
             |  FROM events)
             |SELECT event_id,
             |  CASE WHEN CAST(h AS DOUBLE) / 4294967296.0 < 0.75 THEN 'train'
             |       WHEN CAST(h AS DOUBLE) / 4294967296.0 < 0.875 THEN 'val'
             |       ELSE 'test' END AS split,
             |  h < 429496729 AS sampled_10pct
             |FROM u""".stripMargin)),

    // Seeded EPOCH shuffle — the between-epochs global reshuffle of a
    // training run as a layout operation: md5(seed || '-' || id) keys a
    // pseudo-random total order (layout-independent, unlike rand()),
    // pos ranks it via DistScan's distributed row number, and shard
    // cuts EXACTLY-equal contiguous slices with ntile arithmetic so
    // every data-parallel worker reads the same-sized range. The
    // oracle replays hash → row_number → ntile; a different seed
    // (checked in PropertySpec) yields an unrelated permutation.
    QueryDef("epoch_shuffle",
      (s, d) => {
        import graft.operators.SampleOps
        SampleOps.epochShuffle(T.documents(s, d).select("doc_id"),
          "doc_id", 7L, 16)
          .select(col("doc_id"), col("pos"), col("shard").cast("long")
            .as("shard"))
      },
      Some("""WITH h AS (SELECT doc_id, md5('7-' || doc_id) AS hk
             |  FROM documents)
             |SELECT doc_id,
             |  row_number() OVER (ORDER BY hk, doc_id) AS pos,
             |  CAST(ntile(16) OVER (ORDER BY hk, doc_id) AS BIGINT) AS shard
             |FROM h""".stripMargin)),

    // sort with order captured as a rank column (row content alone can't
    // witness ORDER BY — the differential compare re-sorts rows).
    // Ranked via DistScan.withGlobalRowNumber: range shuffle + per-range
    // numbering + prefix offsets, no single-partition window.
    QueryDef("sort_multi_rank",
      (s, d) => {
        import graft.operators.DistScan
        DistScan.withGlobalRowNumber(T.orders(s, d),
          Seq(col("o_orderstatus").asc, col("o_totalprice").desc,
            col("o_orderkey").asc), "pos")._1
          .select("o_orderkey", "pos")
      },
      Some("""SELECT o_orderkey, row_number() OVER (
             |  ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC) AS pos
             |FROM orders""".stripMargin)),

    QueryDef("sort_nulls_first_rank",
      (s, d) => {
        import graft.operators.DistScan
        DistScan.withGlobalRowNumber(
          T.orders(s, d).withColumn("k",
            when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice"))),
          Seq(col("k").asc_nulls_first, col("o_orderkey").asc), "pos")._1
          .select("o_orderkey", "pos")
      },
      Some("""SELECT o_orderkey, row_number() OVER (
             |  ORDER BY (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END)
             |    ASC NULLS FIRST, o_orderkey ASC) AS pos
             |FROM orders""".stripMargin))
  )
}

package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.llm.SimilarityOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The user-code application surface + remaining positional/label ops:
  * groupby.apply (typed flatMapGroups), Spearman corr, iloc slices,
  * reindex, lookup, tz localize/convert, embedding near-dup baseline.
  *
  * References: apply `pandas/core/groupby/groupby.py:701`, corr
  * method='spearman' `pandas/core/frame.py:7027`, iloc
  * `pandas/core/indexing.py:1977`, reindex `pandas/core/generic.py:4343`,
  * lookup `pandas/core/frame.py:3549`, tz_localize/tz_convert
  * `pandas/core/generic.py:8983,8904`.
  */
object ApplyQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    // groupby(...).apply(zscore): arbitrary per-group user code via the
    // typed Dataset API — groupByKey + flatMapGroups, the Spark-native
    // carrier for reference groupby.apply. One shuffle on the key; each
    // group streams through the lambda. Arithmetic matches the oracle
    // bit-for-bit: exact integer-cent sums, then the identical
    // division/sqrt sequence on both engines.
    QueryDef("groupby_apply_zscore",
      (s, d) => {
        import s.implicits._
        val base = T.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
          .as[(Long, Long, Double)]
        base.groupByKey(_._2).flatMapGroups { (_, it) =>
          val rows = it.toArray
          val n = rows.length
          var sx = 0L; var sxx = 0L
          rows.foreach { r =>
            val c = math.round(r._3 * 100); sx += c; sxx += c * c
          }
          val num = n.toLong * sxx - sx * sx
          if (n < 2 || num == 0L) rows.iterator.map(r => (r._1, Option.empty[Double]))
          else {
            val sd = math.sqrt(num.toDouble / (n.toLong * (n - 1)) / 10000.0)
            val mean = sx.toDouble / n / 100.0
            rows.iterator.map(r => (r._1, Some((r._3 - mean) / sd)))
          }
        }.toDF("event_id", "z")
      },
      Some("""WITH b AS (SELECT event_id, user_id, value,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events),
             |g AS (SELECT user_id, count(*) AS n, sum(c) AS sx, sum(c * c) AS sxx
             |      FROM b GROUP BY user_id)
             |SELECT event_id,
             |  CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0 THEN
             |    (value - (CAST(sx AS DOUBLE) / n / 100.0))
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1)) / 10000.0)
             |  END AS z
             |FROM b JOIN g USING (user_id)""".stripMargin)),

    // corr(method='spearman') per group: Pearson over 2×average-ranks
    // (the doubling keeps tied-rank midpoints integral; scale cancels).
    // All sums exact in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); the
    // only floating-point ops are the shared final div/sqrt.
    QueryDef("spearman_corr",
      (s, d) => {
        val d38 = DecimalType(38, 0)
        val base = T.events(s, d).select(col("event_type"),
          col("value"), unix_micros(col("ts")).as("t"))
        def r2(c: String) =
          (rank().over(Window.partitionBy("event_type").orderBy(col(c))) * 2
            + count(lit(1)).over(Window.partitionBy("event_type", c)) - 1)
        val ranked = base
          .withColumn("rx", r2("value").cast("long"))
          .withColumn("ry", r2("t").cast("long"))
        val agg = ranked.groupBy("event_type").agg(
          count(lit(1)).cast(d38).as("n"),
          sum(col("rx").cast(d38)).as("sx"),
          sum(col("ry").cast(d38)).as("sy"),
          sum((col("rx") * col("ry")).cast(d38)).as("sxy"),
          sum((col("rx") * col("rx")).cast(d38)).as("sxx"),
          sum((col("ry") * col("ry")).cast(d38)).as("syy"))
        val d1 = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val d2 = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        agg.select(col("event_type"),
          when(d1 > 0 && d2 > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(d1) * sqrt(d2))).as("spearman"))
      },
      Some("""WITH r AS (SELECT event_type,
             |    rank() OVER (PARTITION BY event_type ORDER BY value) * 2
             |      + count(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
             |    rank() OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) * 2
             |      + count(*) OVER (PARTITION BY event_type, epoch_us(ts)) - 1 AS ry
             |  FROM events),
             |a AS (SELECT event_type, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
             |        sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
             |      FROM r GROUP BY event_type)
             |SELECT event_type,
             |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             |        AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) /
             |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             |  END AS spearman
             |FROM a""".stripMargin)),

    // iloc[100:110] over a declared total order: distributed top-k
    // (TakeOrderedAndProject) for the 110-row prefix, then the tiny
    // in-memory window numbers just those rows — no full-data global
    // window at any scale.
    QueryDef("iloc_slice",
      (s, d) => {
        val ord = Seq(col("ts"), col("event_id"))
        T.events(s, d).orderBy(ord: _*).limit(110)
          .withColumn("rn", row_number().over(Window.orderBy(ord: _*)))
          .filter(col("rn") > 100)
          .select(col("rn"), col("event_id"), col("value"))
      },
      Some("""SELECT rn, event_id, value FROM (
             |  SELECT event_id, value,
             |    row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn > 100 AND rn <= 110""".stripMargin)),

    // reindex to an explicit new index: left join from the target index
    // frame; labels absent from the source appear with nulls.
    QueryDef("reindex_align",
      (s, d) => {
        val idx = s.range(0, 31).select(col("id").cast("int").as("key"))
        idx.join(T.nation(s, d)
            .select(col("n_nationkey").as("key"), col("n_name")),
          Seq("key"), "left")
          .select(col("key"), col("n_name"))
      },
      Some("""SELECT CAST(i AS INTEGER) AS key, n_name
             |FROM range(31) t(i)
             |LEFT JOIN nation ON n_nationkey = i""".stripMargin)),

    // lookup(row_labels, col_labels): per-row column pick as a CASE
    // chain — fully codegen'd, no driver loop.
    QueryDef("lookup_pick",
      (s, d) => T.events(s, d).select(col("event_id"),
        when(col("event_type") === "click", col("value"))
          .when(col("event_type") === "view", col("user_id").cast("double"))
          .otherwise(length(col("props")).cast("double")).as("picked")),
      Some("""SELECT event_id,
             |  CASE WHEN event_type = 'click' THEN value
             |       WHEN event_type = 'view' THEN CAST(user_id AS DOUBLE)
             |       ELSE CAST(length(props) AS DOUBLE) END AS picked
             |FROM events""".stripMargin)),

    // tz_localize (naive→UTC instant) and tz_convert (UTC→wall time):
    // IANA rules on both engines; the events fixture spans January only,
    // clear of DST transitions, so local-time ambiguity cannot arise.
    QueryDef("tz_localize_convert",
      (s, d) => T.events(s, d).select(col("event_id"),
        to_utc_timestamp(col("ts"), "America/New_York").as("utc_from_ny"),
        from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tokyo_wall")),
      Some("""SELECT event_id,
             |  CAST(timezone('America/New_York', ts) AS TIMESTAMP) AS utc_from_ny,
             |  timezone('Asia/Tokyo', ts::TIMESTAMPTZ) AS tokyo_wall
             |FROM events""".stripMargin)),

    // cumsum(axis=1) + clip(column bounds): row-wise prefix sums across
    // the column order, and clip against per-row bounds — both pure
    // scan-local arithmetic. Exact decimal additions, cast back.
    QueryDef("cumsum_axis1_clip",
      (s, d) => {
        val a = dec2(col("value"))
        val b = dec2(get_json_object(col("props"), "$.k").cast("double"))
        val c = dec2((col("user_id") % 100).cast("double"))
        val hi = (col("user_id") % 300 + 100).cast("double")
        T.events(s, d).select(col("event_id"),
          a.cast("double").as("c1"),
          (a + b).cast("double").as("c2"),
          (a + b + c).cast("double").as("c3"),
          least(greatest(col("value"), lit(10.0)), hi).as("clipped"))
      },
      Some("""SELECT event_id,
             |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS c1,
             |  CAST(CAST(value AS DECIMAL(12,2))
             |    + CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(12,2)) AS DOUBLE) AS c2,
             |  CAST(CAST(value AS DECIMAL(12,2))
             |    + CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(12,2))
             |    + CAST(CAST(user_id % 100 AS DOUBLE) AS DECIMAL(12,2)) AS DOUBLE) AS c3,
             |  least(greatest(value, 10.0), CAST(user_id % 300 + 100 AS DOUBLE)) AS clipped
             |FROM events""".stripMargin)),

    // rank(axis=1, method='min'): each cell's rank among its own row's
    // values — array filter counts, no pivot, scan-local. Values are
    // made distinct-free-safe by comparing exact doubles.
    QueryDef("rank_axis1",
      (s, d) => {
        val a = col("value")
        val b = get_json_object(col("props"), "$.k").cast("double")
        val c = (col("user_id") % 100).cast("double")
        val arr = array(a, b, c)
        T.events(s, d)
          .withColumn("__arr", arr)
          .select(col("event_id"),
            (size(filter(col("__arr"), v => v < a)) + 1).as("rank_a"),
            (size(filter(col("__arr"), v => v < b)) + 1).as("rank_b"),
            (size(filter(col("__arr"), v => v < c)) + 1).as("rank_c"))
      },
      Some("""WITH t AS (SELECT event_id,
             |    [value, CAST(json_extract_string(props, '$.k') AS DOUBLE),
             |     CAST(user_id % 100 AS DOUBLE)] AS arr,
             |    value AS a, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS b,
             |    CAST(user_id % 100 AS DOUBLE) AS c
             |  FROM events)
             |SELECT event_id,
             |  len(list_filter(arr, v -> v < a)) + 1 AS rank_a,
             |  len(list_filter(arr, v -> v < b)) + 1 AS rank_b,
             |  len(list_filter(arr, v -> v < c)) + 1 AS rank_c
             |FROM t""".stripMargin)),

    // axis=1 reductions: per-row non-null count / any / all across a
    // column set (reference: frame.py:7038 count(axis=1), nanops any/all)
    // — pure codegen'd expressions, no row pivoting.
    QueryDef("row_axis_reductions",
      (s, d) => {
        val a = col("value")
        val b = get_json_object(col("props"), "$.k").cast("double")
        val c = when(col("event_type") === "error", lit(null))
          .otherwise(col("user_id").cast("double"))
        val cols = Seq(a, b, c)
        T.events(s, d).select(col("event_id"),
          cols.map(x => when(x.isNotNull, 1).otherwise(0)).reduce(_ + _)
            .as("n_notnull"),
          cols.map(x => coalesce(x > 50, lit(false))).reduce(_ || _).as("any_big"),
          cols.map(x => coalesce(x >= 0, lit(false))).reduce(_ && _).as("all_nonneg"))
      },
      Some("""SELECT event_id,
             |  (CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
             |  + (CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END)
             |  + (CASE WHEN (CASE WHEN event_type = 'error' THEN NULL
             |                     ELSE CAST(user_id AS DOUBLE) END) IS NOT NULL THEN 1 ELSE 0 END)
             |    AS n_notnull,
             |  coalesce(value > 50, false)
             |    OR coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50, false)
             |    OR coalesce((CASE WHEN event_type = 'error' THEN NULL
             |                      ELSE CAST(user_id AS DOUBLE) END) > 50, false) AS any_big,
             |  coalesce(value >= 0, false)
             |    AND coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 0, false)
             |    AND coalesce((CASE WHEN event_type = 'error' THEN NULL
             |                       ELSE CAST(user_id AS DOUBLE) END) >= 0, false) AS all_nonneg
             |FROM events""".stripMargin)),

    // Series.map / DataFrame row apply: the typed Dataset.map surface —
    // arbitrary per-row Scala, exact-cent arithmetic for oracle parity.
    QueryDef("dataset_map_typed",
      (s, d) => {
        import s.implicits._
        T.events(s, d).select(col("event_id"), col("value"))
          .as[(Long, Double)]
          .map { case (id, v) =>
            val cents = math.round(v * 100)
            (id, cents * 3 / 100.0, if (cents % 2 == 0) "even" else "odd")
          }
          .toDF("event_id", "tripled", "parity")
      },
      Some("""SELECT event_id,
             |  CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * 3 AS DOUBLE)
             |    / 100.0 AS tripled,
             |  CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) % 2 = 0
             |    THEN 'even' ELSE 'odd' END AS parity
             |FROM events""".stripMargin)),

    // Embedding-cosine near-duplicate pairs — EXACT all-pairs baseline
    // (oracle-checkable); the production scale path is the LSH-bucketed
    // SimilarityOps.embeddingNearDupPairs (spec-tested recall), which
    // never materializes the quadratic join.
    QueryDef("embedding_near_dup",
      (s, d) => {
        val c = T.embeddings(s, d).select(col("vec_id"),
          SimilarityOps.toDoubleArr(col("embedding")).as("e"))
        val a = c.select(col("vec_id").as("id_a"), col("e").as("e_a"))
        val b = c.select(col("vec_id").as("id_b"), col("e").as("e_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("score", SimilarityOps.cosine(col("e_a"), col("e_b")))
          .filter(col("score") >= 0.4)
          .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      },
      Some("""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    list_dot_product(a.e, b.e) /
             |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS score
             |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
             |SELECT id_a, id_b, round(score, 6) AS score
             |FROM s WHERE score >= 0.4""".stripMargin)),

    // SemDeDup end-to-end (Abbas et al. 2023; SimilarityOps
    // .semanticDedup): sign-bucketed cosine pairs → connected
    // components → keep min-id per cluster. Vectors 0-49 get planted
    // clones at vec_id+10000 scaled by 1.5 — scaling changes NEITHER
    // the sign bucket NOR the cosine (still 1.0), so every clone is
    // guaranteed to cluster with its original and must vanish while
    // the original survives; the natural ≥0.4 in-bucket pairs dedup
    // too. The oracle replays the whole pipeline: same axis-aligned
    // sign sketch, same double cosine (sequential dot product on both
    // engines — the embedding_near_dup gate pins that equality), and
    // the recursive-CTE components.
    QueryDef("semantic_dedup",
      (s, d) => {
        val base = T.embeddings(s, d).select(col("vec_id"),
          SimilarityOps.toDoubleArr(col("embedding")).as("embedding"))
        val planted = base.filter(col("vec_id") < 50)
          .select((col("vec_id") + 10000).as("vec_id"),
            transform(col("embedding"), x => x * lit(1.5)).as("embedding"))
        SimilarityOps.semanticDedup(base.unionByName(planted), "vec_id",
          bits = 6, minCosine = 0.4).select("vec_id")
      },
      Some {
        val bucketSql = (0 until 6).map(i =>
          s"(CASE WHEN e[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH RECURSIVE c AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 10000,
           |    list_transform(embedding::DOUBLE[], x -> x * 1.5)
           |  FROM embeddings WHERE vec_id < 50),
           |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM c),
           |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b
           |  FROM b a JOIN b b2
           |    ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
           |  WHERE list_dot_product(a.e, b2.e) /
           |    (sqrt(list_dot_product(a.e, a.e)) *
           |     sqrt(list_dot_product(b2.e, b2.e))) >= 0.4),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |      UNION SELECT id_b, id_a FROM p),
           |reach(a, b) AS (SELECT a, b FROM e
           |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
           |losers AS (SELECT a AS vec_id FROM reach
           |  GROUP BY a HAVING least(a, min(b)) <> a)
           |SELECT vec_id FROM c
           |WHERE vec_id NOT IN (SELECT vec_id FROM losers)""".stripMargin
      })
  )
}

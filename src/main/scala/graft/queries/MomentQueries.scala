package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Higher-moment statistics with pandas' adjusted (Fisher) definitions
  * (reference: pandas/core/nanops.py:390-967 nanskew/nankurt), computed
  * EXACTLY from integer-cent power sums:
  *
  *   B  = nΣx²−(Σx)²        (= n²·m2)
  *   A3 = n²Σx³−3nΣx²Σx+2(Σx)³   (= n³·m3)
  *   A4 = n³Σx⁴−4n²Σx³Σx+6nΣx²(Σx)²−3(Σx)⁴  (= n⁴·m4)
  *
  *   skew = √(n(n−1))/(n−2) · A3/B^1.5
  *   kurt = ((n²−1)·A4/B² − 3(n−1)²) / ((n−2)(n−3))
  *
  * The scale factors cancel, so the only floating-point ops are the
  * final divisions/sqrt/pow — identical IEEE on both engines. Integer
  * combinations ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): exact up
  * to ~n=2·10⁵ per group for the 4th moment of 2-decimal values.
  */
object MomentQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    QueryDef("groupby_skew_kurt",
      (s, d) => {
        val d38 = DecimalType(38, 0)
        val cents = (dec2(col("value")) * 100).cast("long")
        val base = T.events(s, d).withColumn("c", cents)
        // cast to decimal BEFORE multiplying: c⁴ of 2-decimal values
        // overflows Long once |value| > ~550 (seen at sf0.1)
        val cd = col("c").cast(d38)
        val agg = base.groupBy("event_type").agg(
          count(col("c")).as("n"),
          sum(cd).as("s1"),
          sum(cd * cd).as("s2"),
          sum(cd * cd * cd).as("s3"),
          sum(cd * cd * cd * cd).as("s4"))
        val n = col("n")
        val nd = col("n").cast(d38)
        val b = (nd * col("s2") - col("s1") * col("s1")).cast("double")
        val a3 = (nd * nd * col("s3") - lit(3).cast(d38) * nd * col("s2") * col("s1")
          + lit(2).cast(d38) * col("s1") * col("s1") * col("s1")).cast("double")
        val a4 = (nd * nd * nd * col("s4")
          - lit(4).cast(d38) * nd * nd * col("s3") * col("s1")
          + lit(6).cast(d38) * nd * col("s2") * col("s1") * col("s1")
          - lit(3).cast(d38) * col("s1") * col("s1") * col("s1") * col("s1"))
          .cast("double")
        val skew = when(n > 2 && b > 0,
          round(sqrt((n * (n - 1)).cast("double")) / (n - 2) * a3 / pow(b, 1.5), 6))
        val kurt = when(n > 3 && b > 0,
          round(((n * n - 1) * (a4 / (b * b)) - lit(3.0) * (n - 1) * (n - 1)) /
            ((n - 2) * (n - 3)), 6))
        agg.select(col("event_type"), col("n"), skew.as("skew"), kurt.as("kurt"))
      },
      Some("""WITH base AS (SELECT event_type,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c FROM events),
             |agg AS (SELECT event_type, count(c) AS n,
             |    sum(h) AS s1, sum(h * h) AS s2,
             |    sum(h * h * h) AS s3, sum(h * h * h * h) AS s4
             |  FROM (SELECT event_type, c, CAST(c AS HUGEINT) AS h FROM base)
             |  GROUP BY event_type),
             |raw AS (SELECT event_type, n,
             |    CAST(n AS HUGEINT) * s2 - s1 * s1 AS braw,
             |    CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3
             |      - 3 * CAST(n AS HUGEINT) * s2 * s1 + 2 * s1 * s1 * s1 AS a3raw,
             |    CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s4
             |      - 4 * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3 * s1
             |      + 6 * CAST(n AS HUGEINT) * s2 * s1 * s1
             |      - 3 * s1 * s1 * s1 * s1 AS a4raw
             |  FROM agg),
             |m AS (SELECT event_type, n,
             |    sign(braw) * CAST(abs(braw) AS DOUBLE) AS b,
             |    sign(a3raw) * CAST(abs(a3raw) AS DOUBLE) AS a3,
             |    sign(a4raw) * CAST(abs(a4raw) AS DOUBLE) AS a4
             |  FROM raw)
             |SELECT event_type, n,
             |  CASE WHEN n > 2 AND b > 0 THEN
             |    round(sqrt(CAST(n * (n - 1) AS DOUBLE)) / (n - 2) * a3 / pow(b, 1.5), 6)
             |  END AS skew,
             |  CASE WHEN n > 3 AND b > 0 THEN
             |    round(((n * n - 1) * (a4 / (b * b)) - 3.0 * (n - 1) * (n - 1)) /
             |          ((n - 2) * (n - 3)), 6)
             |  END AS kurt
             |FROM m""".stripMargin)),

    // expanding().skew() / .kurt() (reference core/window.py:1792 —
    // Expanding mirrors Rolling's full method table; kernels
    // window.pyx:1010/1106 with an unbounded-preceding frame). Same
    // exact cent-power-sum machinery as groupby_skew_kurt, evaluated
    // over a cumulative window: sums stay exact in DECIMAL(38,0) /
    // HUGEINT up to ~2·10⁵ rows per group for the 4th moment, far above
    // any per-user history in the fixtures; repartitioning users across
    // executors keeps this scale-safe at 100 TB (window is per-user).
    QueryDef("expanding_skew_kurt",
      (s, d) => {
        import graft.operators.RollingOps
        val d38 = DecimalType(38, 0)
        val w = RollingOps.expanding(Seq("user_id"), Seq(col("ts"), col("event_id")))
        val cents = (dec2(col("value")) * 100).cast("long")
        val base = T.events(s, d).withColumn("c", cents)
        val cd = col("c").cast(d38)
        val n = count(col("c")).over(w)
        val s1 = sum(cd).over(w)
        val s2 = sum(cd * cd).over(w)
        val s3 = sum(cd * cd * cd).over(w)
        val s4 = sum(cd * cd * cd * cd).over(w)
        val nd = n.cast(d38)
        val b = (nd * s2 - s1 * s1).cast("double")
        val a3 = (nd * nd * s3 - lit(3).cast(d38) * nd * s2 * s1
          + lit(2).cast(d38) * s1 * s1 * s1).cast("double")
        val a4 = (nd * nd * nd * s4
          - lit(4).cast(d38) * nd * nd * s3 * s1
          + lit(6).cast(d38) * nd * s2 * s1 * s1
          - lit(3).cast(d38) * s1 * s1 * s1 * s1).cast("double")
        val skew = when(n > 2 && b > 0,
          round(sqrt((n * (n - 1)).cast("double")) / (n - 2) * a3 / pow(b, 1.5), 6))
        val kurt = when(n > 3 && b > 0,
          round(((n * n - 1) * (a4 / (b * b)) - lit(3.0) * (n - 1) * (n - 1)) /
            ((n - 2) * (n - 3)), 6))
        base.select(col("event_id"), skew.as("exp_skew"), kurt.as("exp_kurt"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, ts,
             |    CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT) AS c
             |  FROM events),
             |w AS (SELECT event_id, count(c) OVER w AS n, sum(c) OVER w AS s1,
             |    sum(c * c) OVER w AS s2, sum(c * c * c) OVER w AS s3,
             |    sum(c * c * c * c) OVER w AS s4
             |  FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |m AS (SELECT event_id, n,
             |    CAST(n AS HUGEINT) * s2 - s1 * s1 AS braw,
             |    CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3
             |      - 3 * CAST(n AS HUGEINT) * s2 * s1 + 2 * s1 * s1 * s1 AS a3raw,
             |    CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s4
             |      - 4 * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3 * s1
             |      + 6 * CAST(n AS HUGEINT) * s2 * s1 * s1
             |      - 3 * s1 * s1 * s1 * s1 AS a4raw
             |  FROM w)
             |SELECT event_id,
             |  CASE WHEN n > 2 AND braw > 0 THEN
             |    round(sqrt(CAST(n * (n - 1) AS DOUBLE)) / (n - 2)
             |      * (sign(a3raw) * CAST(abs(a3raw) AS DOUBLE))
             |      / pow(sign(braw) * CAST(abs(braw) AS DOUBLE), 1.5), 6)
             |  END AS exp_skew,
             |  CASE WHEN n > 3 AND braw > 0 THEN
             |    round(((n * n - 1) * ((sign(a4raw) * CAST(abs(a4raw) AS DOUBLE))
             |        / (CAST(braw AS DOUBLE) * CAST(braw AS DOUBLE)))
             |      - 3.0 * (n - 1) * (n - 1)) / ((n - 2) * (n - 3)), 6)
             |  END AS exp_kurt
             |FROM m""".stripMargin)),

    // str.extractall → Generator shape: array-returning regexp + explode
    // (reference strings.py:2765; compared as a (doc_id, match) multiset).
    QueryDef("str_extractall",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("ta[a-z]+"), lit(0))).as("m")),
      Some("""SELECT doc_id, unnest(regexp_extract_all(text, 'ta[a-z]+')) AS m
             |FROM documents""".stripMargin)),

    // describe() for object dtype: count / unique / top / freq
    // (reference generic.py:9084 describe_categorical_1d).
    QueryDef("describe_object",
      (s, d) => {
        val top = T.events(s, d).groupBy("event_type")
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("event_type").asc).limit(1)
          .select(col("event_type").as("top"), col("freq"))
        val stats = T.events(s, d).agg(
          count(col("event_type")).as("cnt"),
          countDistinct(col("event_type")).as("unique"))
        stats.crossJoin(top)
      },
      Some("""SELECT (SELECT count(event_type) FROM events) AS cnt,
             |  (SELECT count(DISTINCT event_type) FROM events) AS unique,
             |  event_type AS top, count(*) AS freq
             |FROM events GROUP BY event_type
             |ORDER BY freq DESC, event_type LIMIT 1""".stripMargin)),

    // DataFrame.corr()/cov() pairwise matrix (reference frame.py:7027,
    // :7155), long form. One aggregate computes every power/cross sum
    // exactly (cents → DECIMAL(38,0)/HUGEINT); the three matrix cells
    // are projections of that single row — one pass over the data, not
    // one per pair.
    QueryDef("corr_cov_matrix",
      (s, d) => {
        val d38 = DecimalType(38, 0)
        val cents = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
          "l_discount" -> "r")
        val base = cents.foldLeft(T.lineitem(s, d)) { case (df, (c, a)) =>
          df.withColumn(a, (dec2(col(c)) * 100).cast("long"))
        }
        val sums = cents.flatMap { case (_, a) => Seq(
          sum(col(a).cast(d38)).as(s"s_$a"),
          sum((col(a) * col(a)).cast(d38)).as(s"s_$a$a"))
        } ++ Seq(
          sum((col("q") * col("p")).cast(d38)).as("s_qp"),
          sum((col("q") * col("r")).cast(d38)).as("s_qr"),
          sum((col("p") * col("r")).cast(d38)).as("s_pr"),
          count(lit(1)).cast(d38).as("n"))
        val agg = base.agg(sums.head, sums.tail: _*)
        def cell(x: String, y: String, sxy: String) = {
          val n = col("n")
          val num = (n * col(sxy) - col(s"s_$x") * col(s"s_$y")).cast("double")
          val corr = num / (sqrt((n * col(s"s_$x$x") - col(s"s_$x") * col(s"s_$x")).cast("double")) *
            sqrt((n * col(s"s_$y$y") - col(s"s_$y") * col(s"s_$y")).cast("double")))
          val cov = num / (n * (n - 1)).cast("double") / 10000.0
          (corr, cov)
        }
        val rows = Seq(("q", "p", "s_qp"), ("q", "r", "s_qr"), ("p", "r", "s_pr"))
          .map { case (x, y, sxy) =>
            val (corr, cov) = cell(x, y, sxy)
            agg.select(lit(x).as("col_x"), lit(y).as("col_y"),
              corr.as("corr"), cov.as("cov"))
          }
        rows.reduce(_ unionByName _)
      },
      Some("""WITH b AS (SELECT
             |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q,
             |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p,
             |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS r
             |  FROM lineitem),
             |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(q AS HUGEINT)) AS s_q, sum(CAST(q*q AS HUGEINT)) AS s_qq,
             |    sum(CAST(p AS HUGEINT)) AS s_p, sum(CAST(p*p AS HUGEINT)) AS s_pp,
             |    sum(CAST(r AS HUGEINT)) AS s_r, sum(CAST(r*r AS HUGEINT)) AS s_rr,
             |    sum(CAST(q*p AS HUGEINT)) AS s_qp,
             |    sum(CAST(q*r AS HUGEINT)) AS s_qr,
             |    sum(CAST(p*r AS HUGEINT)) AS s_pr
             |  FROM b)
             |SELECT 'q' AS col_x, 'p' AS col_y,
             |  sign(n*s_qp - s_q*s_p) * CAST(abs(n*s_qp - s_q*s_p) AS DOUBLE) /
             |    (sqrt(CAST(n*s_qq - s_q*s_q AS DOUBLE)) * sqrt(CAST(n*s_pp - s_p*s_p AS DOUBLE))) AS corr,
             |  sign(n*s_qp - s_q*s_p) * CAST(abs(n*s_qp - s_q*s_p) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov
             |FROM a
             |UNION ALL SELECT 'q', 'r',
             |  sign(n*s_qr - s_q*s_r) * CAST(abs(n*s_qr - s_q*s_r) AS DOUBLE) /
             |    (sqrt(CAST(n*s_qq - s_q*s_q AS DOUBLE)) * sqrt(CAST(n*s_rr - s_r*s_r AS DOUBLE))),
             |  sign(n*s_qr - s_q*s_r) * CAST(abs(n*s_qr - s_q*s_r) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0
             |FROM a
             |UNION ALL SELECT 'p', 'r',
             |  sign(n*s_pr - s_p*s_r) * CAST(abs(n*s_pr - s_p*s_r) AS DOUBLE) /
             |    (sqrt(CAST(n*s_pp - s_p*s_p AS DOUBLE)) * sqrt(CAST(n*s_rr - s_r*s_r AS DOUBLE))),
             |  sign(n*s_pr - s_p*s_r) * CAST(abs(n*s_pr - s_p*s_r) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0
             |FROM a""".stripMargin)),

    // groupby(...).corr() — grouped Pearson, exact sums; the time axis
    // is re-based to the fixture epoch so squares stay well inside
    // DECIMAL(38,0)/HUGEINT.
    QueryDef("groupby_corr",
      (s, d) => {
        val d38 = DecimalType(38, 0)
        val base = T.events(s, d).select(col("event_type"),
          (dec2(col("value")) * 100).cast("long").as("c"),
          expr("unix_micros(ts) div 1000000 - 1704067200").as("t"))
        val agg = base.groupBy("event_type").agg(
          count(lit(1)).cast(d38).as("n"),
          sum(col("c").cast(d38)).as("sx"),
          sum(col("t").cast(d38)).as("sy"),
          sum((col("c") * col("t")).cast(d38)).as("sxy"),
          sum((col("c") * col("c")).cast(d38)).as("sxx"),
          sum((col("t") * col("t")).cast(d38)).as("syy"))
        val d1 = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val d2 = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        agg.select(col("event_type"),
          when(d1 > 0 && d2 > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(d1) * sqrt(d2))).as("pearson"))
      },
      Some("""WITH b AS (SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c,
             |    epoch_us(ts) // 1000000 - 1704067200 AS t
             |  FROM events),
             |a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(c AS HUGEINT)) AS sx, sum(CAST(t AS HUGEINT)) AS sy,
             |    sum(CAST(c*t AS HUGEINT)) AS sxy, sum(CAST(c*c AS HUGEINT)) AS sxx,
             |    sum(CAST(t*t AS HUGEINT)) AS syy
             |  FROM b GROUP BY event_type)
             |SELECT event_type,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
             |        AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             |    sign(n*sxy - sx*sy) * CAST(abs(n*sxy - sx*sy) AS DOUBLE) /
             |      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
             |  END AS pearson
             |FROM a""".stripMargin)),

    // corr(method='kendall') per group — Knight's O(n log n) τ-b in
    // flatMapGroups vs the oracle's O(n²) pairwise definition: an
    // algorithmic differential, not just a numeric one.
    QueryDef("kendall_tau",
      (s, d) => {
        import s.implicits._
        val base = T.events(s, d).filter(col("value").isNotNull)
          .select(col("event_type"),
            (dec2(col("value")) * 100).cast("long").as("x"),
            expr("unix_micros(ts) div 1000000 - 1704067200").as("y"))
          .as[(String, Long, Long)]
        base.groupByKey(_._1).mapGroups { (k, it) =>
          val rows = it.toArray
          (k, graft.functions.KendallTau.tauB(rows.map(_._2), rows.map(_._3)))
        }.toDF("event_type", "tau")
      },
      Some("""WITH b AS (SELECT event_type,
             |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             |    epoch_us(ts) // 1000000 - 1704067200 AS y,
             |    row_number() OVER () AS rid
             |  FROM events WHERE value IS NOT NULL),
             |cd AS (SELECT a.event_type,
             |    sum(CASE WHEN sign(a.x - c.x) * sign(a.y - c.y) = 1 THEN 1 ELSE 0 END) AS conc,
             |    sum(CASE WHEN sign(a.x - c.x) * sign(a.y - c.y) = -1 THEN 1 ELSE 0 END) AS disc
             |  FROM b a JOIN b c ON a.event_type = c.event_type AND a.rid < c.rid
             |  GROUP BY a.event_type),
             |tx AS (SELECT event_type, sum(c * (c - 1) / 2) AS n1 FROM
             |    (SELECT event_type, x, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1),
             |ty AS (SELECT event_type, sum(c * (c - 1) / 2) AS n2 FROM
             |    (SELECT event_type, y, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1),
             |nn AS (SELECT event_type, count(*) * (count(*) - 1) / 2 AS n0 FROM b GROUP BY 1)
             |SELECT event_type,
             |  CASE WHEN n0 - n1 <> 0 AND n0 - n2 <> 0 THEN
             |    CAST(conc - disc AS DOUBLE) /
             |      (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE)))
             |  END AS tau
             |FROM cd JOIN tx USING (event_type) JOIN ty USING (event_type)
             |  JOIN nn USING (event_type)""".stripMargin))
  )
}

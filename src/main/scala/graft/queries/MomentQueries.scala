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
        val agg = base.groupBy("event_type").agg(
          count(col("c")).as("n"),
          sum(col("c").cast(d38)).as("s1"),
          sum((col("c") * col("c")).cast(d38)).as("s2"),
          sum((col("c") * col("c") * col("c")).cast(d38)).as("s3"),
          sum((col("c") * col("c") * col("c") * col("c")).cast(d38)).as("s4"))
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
             |    CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s1,
             |    CAST(sum(CAST(c * c AS HUGEINT)) AS HUGEINT) AS s2,
             |    CAST(sum(CAST(c * c * c AS HUGEINT)) AS HUGEINT) AS s3,
             |    CAST(sum(CAST(c * c * c * c AS HUGEINT)) AS HUGEINT) AS s4
             |  FROM base GROUP BY event_type),
             |m AS (SELECT event_type, n,
             |    CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE) AS b,
             |    CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3
             |      - 3 * CAST(n AS HUGEINT) * s2 * s1 + 2 * s1 * s1 * s1 AS DOUBLE) AS a3,
             |    CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s4
             |      - 4 * CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * s3 * s1
             |      + 6 * CAST(n AS HUGEINT) * s2 * s1 * s1
             |      - 3 * s1 * s1 * s1 * s1 AS DOUBLE) AS a4
             |  FROM agg)
             |SELECT event_type, n,
             |  CASE WHEN n > 2 AND b > 0 THEN
             |    round(sqrt(CAST(n * (n - 1) AS DOUBLE)) / (n - 2) * a3 / pow(b, 1.5), 6)
             |  END AS skew,
             |  CASE WHEN n > 3 AND b > 0 THEN
             |    round(((n * n - 1) * (a4 / (b * b)) - 3.0 * (n - 1) * (n - 1)) /
             |          ((n - 2) * (n - 3)), 6)
             |  END AS kurt
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
             |ORDER BY freq DESC, event_type LIMIT 1""".stripMargin))
  )
}

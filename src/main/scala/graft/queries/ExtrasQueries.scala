package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.expr.QueryExpr
import graft.operators.{JsonNormalize, RollingOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, IntegerType, DoubleType, StringType}

/** Remaining SURVEY §2 coverage: query() grammar, CSV/JSON round-trips,
  * cumprod, exact rolling cov/corr, business-day offsets, factorize,
  * autocorr. */
object ExtrasQueries extends QueryModule {

  private val T = Tables
  import Q._

  private val evOrder = Seq(col("ts"), col("event_id"))

  def defs: Seq[QueryDef] = Seq(

    // pandas df.query("...") string → Catalyst (expr/QueryExpr).
    QueryDef("query_expr_filter",
      (s, d) => T.lineitem(s, d)
        .filter(QueryExpr.translate(
          "l_quantity >= @qmin and (l_discount <= 0.02 or l_returnflag == 'R') and l_linenumber in [1, 2]",
          Map("qmin" -> 45)))
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity >= 45 AND (l_discount <= 0.02 OR l_returnflag = 'R')
             |  AND l_linenumber IN (1, 2)""".stripMargin)),

    // df.eval assignment program over the same grammar: later lines
    // reference earlier targets (reference eval.py:156).
    QueryDef("eval_assign",
      (s, d) => graft.core.PFrame(T.lineitem(s, d))
        .eval("z = l_quantity * 2 + @off\nbig = z >= 60", Map("off" -> 1))
        .df.select("l_orderkey", "l_linenumber", "z", "big"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_quantity * 2 + 1 AS z,
             |  l_quantity * 2 + 1 >= 60 AS big
             |FROM lineitem""".stripMargin)),

    // to_csv/read_csv as expressions: the file-level path is
    // spark.read.csv; the expression round-trip is oracle-checkable.
    QueryDef("csv_roundtrip",
      (s, d) => {
        val schema = StructType(Seq(
          StructField("k", LongType), StructField("ln", IntegerType),
          StructField("qty", DoubleType), StructField("flag", StringType)))
        val line = to_csv(struct(
          col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
          col("l_quantity").as("qty"), col("l_returnflag").as("flag")))
        T.lineitem(s, d).select(from_csv(line, schema,
            Map.empty[String, String]).as("r"))
          .select(col("r.k").as("k"), col("r.ln").as("ln"),
            col("r.qty").as("qty"), col("r.flag").as("flag"))
      },
      Some("""SELECT l_orderkey AS k, l_linenumber AS ln,
             |  l_quantity AS qty, l_returnflag AS flag FROM lineitem""".stripMargin)),

    QueryDef("json_roundtrip",
      (s, d) => {
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("t", StringType),
          StructField("v", DoubleType)))
        val js = to_json(struct(col("event_id").as("id"),
          col("event_type").as("t"), col("value").as("v")))
        T.events(s, d).select(from_json(js, schema).as("r"))
          .select(col("r.id").as("id"), col("r.t").as("t"), col("r.v").as("v"))
      },
      Some("SELECT event_id AS id, event_type AS t, value AS v FROM events")),

    // json_normalize (reference: pandas/io/json/normalize.py:96):
    // lineitems are rolled up into per-order record lists (the one
    // shuffle, inherent to BUILDING nested data), then normalize
    // explodes them back flat with a dotted meta path — a pure
    // scan-local generator + projection, zero added shuffle. The gate
    // pins that build→normalize is the identity on the original rows.
    QueryDef("json_normalize_items",
      (s, d) => {
        val nested = T.lineitem(s, d).filter(col("l_orderkey") < 500)
          .groupBy(col("l_orderkey"))
          .agg(collect_list(struct(col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"))).as("items"))
          .select(struct(col("l_orderkey").as("id")).as("ord"), col("items"))
        JsonNormalize.normalize(nested, Seq("items"),
          meta = Seq(Seq("ord", "id")))
      },
      Some("""SELECT l_linenumber AS ln, l_quantity AS qty,
             |  l_orderkey AS "ord.id"
             |FROM lineitem WHERE l_orderkey < 500""".stripMargin)),

    // cumprod via exp∘sum∘ln (positive inputs; reference cum_func
    // generic.py:10712). round(6) absorbs libm ulp differences.
    QueryDef("cumprod_group",
      (s, d) => {
        val w = RollingOps.expanding(Seq("user_id"), evOrder)
        T.events(s, d).select(col("event_id"),
          round(exp(sum(log(lit(1.0) + col("value") / 1000.0)).over(w)), 6)
            .as("cumprod"))
      },
      Some("""SELECT event_id,
             |  round(exp(sum(ln(1.0 + value / 1000.0)) OVER w), 6) AS cumprod
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Exact rolling covariance/correlation: integer co-moments (cents ×
    // the json 'k' field), one shared IEEE division/sqrt at the end.
    QueryDef("rolling_covcorr",
      (s, d) => {
        val base = T.events(s, d)
          .withColumn("x", (dec2(col("value")) * 100).cast("long"))
          .withColumn("y", get_json_object(col("props"), "$.k").cast("long"))
        val w = RollingOps.fixed(Seq("user_id"), evOrder, 30)
        val n = count(col("x")).over(w)
        val sx = sum(col("x")).over(w);  val sy = sum(col("y")).over(w)
        val sxx = sum(col("x") * col("x")).over(w)
        val syy = sum(col("y") * col("y")).over(w)
        val sxy = sum(col("x") * col("y")).over(w)
        val covNum = (n * sxy - sx * sy).cast("double")
        val varX = (n * sxx - sx * sx).cast("double")
        val varY = (n * syy - sy * sy).cast("double")
        base.select(col("event_id"),
          when(n >= 2, covNum / (n * (n - 1)) / 100.0).as("roll_cov"),
          when(n >= 2 && varX > 0 && varY > 0,
            covNum / (sqrt(varX) * sqrt(varY))).as("roll_corr"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, ts,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS y FROM events),
             |w AS (SELECT event_id, count(x) OVER w AS n,
             |  sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             |  sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             |  sum(x * y) OVER w AS sxy
             |  FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
             |SELECT event_id,
             |  CASE WHEN n >= 2 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) / (n * (n - 1)) / 100.0 END AS roll_cov,
             |  CASE WHEN n >= 2 AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
             |            AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS roll_corr
             |FROM w""".stripMargin)),

    // expanding().cov()/corr(): same exact integer co-moments over the
    // unbounded-preceding frame (reference window.py Expanding.corr).
    QueryDef("expanding_covcorr",
      (s, d) => {
        val base = T.events(s, d)
          .withColumn("x", (dec2(col("value")) * 100).cast("long"))
          .withColumn("y", get_json_object(col("props"), "$.k").cast("long"))
        val w = RollingOps.expanding(Seq("user_id"), evOrder)
        val n = count(col("x")).over(w)
        val sx = sum(col("x")).over(w);  val sy = sum(col("y")).over(w)
        val sxx = sum(col("x") * col("x")).over(w)
        val syy = sum(col("y") * col("y")).over(w)
        val sxy = sum(col("x") * col("y")).over(w)
        val covNum = (n * sxy - sx * sy).cast("double")
        val varX = (n * sxx - sx * sx).cast("double")
        val varY = (n * syy - sy * sy).cast("double")
        base.select(col("event_id"),
          when(n >= 2, covNum / (n * (n - 1)) / 100.0).as("exp_cov"),
          when(n >= 2 && varX > 0 && varY > 0,
            covNum / (sqrt(varX) * sqrt(varY))).as("exp_corr"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, ts,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS y FROM events),
             |w AS (SELECT event_id, count(x) OVER w AS n,
             |  sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             |  sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             |  sum(x * y) OVER w AS sxy
             |  FROM base
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id,
             |  CASE WHEN n >= 2 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) / (n * (n - 1)) / 100.0 END AS exp_cov,
             |  CASE WHEN n >= 2 AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
             |            AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS exp_corr
             |FROM w""".stripMargin)),

    // BusinessDay offset arithmetic (reference tseries/offsets.py:445):
    // next business day. Spark dow: 1=Sun..7=Sat; DuckDB: 0=Sun..6=Sat.
    QueryDef("bdate_shift",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        (col("o_orderdate") + when(dayofweek(col("o_orderdate")) === 6,
            expr("interval 3 days"))
          .when(dayofweek(col("o_orderdate")) === 7, expr("interval 2 days"))
          .otherwise(expr("interval 1 day"))).as("next_bday")),
      Some("""SELECT o_orderkey, o_orderdate +
             |  CASE WHEN dayofweek(o_orderdate) = 5 THEN INTERVAL '3 days'
             |       WHEN dayofweek(o_orderdate) = 6 THEN INTERVAL '2 days'
             |       ELSE INTERVAL '1 day' END AS next_bday
             |FROM orders""".stripMargin)),

    // factorize: dense first-appearance codes (reference algorithms.py:587).
    QueryDef("factorize_codes",
      (s, d) => {
        val firstSeen = T.events(s, d).groupBy("event_type")
          .agg(min(struct(col("ts"), col("event_id"))).as("fs"))
        val codes = firstSeen.withColumn("code",
          row_number().over(Window.orderBy(col("fs"), col("event_type"))) - 1)
          .select("event_type", "code")
        T.events(s, d).join(codes, Seq("event_type"))
          .select("event_id", "code")
      },
      Some("""WITH r AS (SELECT event_type, ts, event_id, row_number() OVER (
             |    PARTITION BY event_type ORDER BY ts, event_id) AS rn FROM events),
             |fs AS (SELECT event_type, ts AS fts, event_id AS feid FROM r WHERE rn = 1),
             |fs2 AS (SELECT event_type,
             |    row_number() OVER (ORDER BY fts, feid, event_type) - 1 AS code
             |  FROM fs)
             |SELECT event_id, code FROM events JOIN fs2 USING (event_type)""".stripMargin)),

    // Series.autocorr (reference series.py:2028): exact integer-cent
    // corr of value with its lag-1 per user.
    QueryDef("autocorr_lag",
      (s, d) => {
        val base = T.events(s, d)
          .withColumn("x", (dec2(col("value")) * 100).cast("long"))
          .withColumn("y",
            lag((dec2(col("value")) * 100).cast("long"), 1)
              .over(RollingOps.ordered(Seq("user_id"), evOrder)))
          .filter(col("y").isNotNull)
        val agg = base.groupBy("user_id").agg(
          count(col("x")).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val varX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val varY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        agg.select(col("user_id"),
          when(col("n") >= 2 && varX > 0 && varY > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt(varX) * sqrt(varY))).as("autocorr"))
      },
      Some("""WITH base AS (SELECT user_id,
             |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             |  lag(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT), 1)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
             |  FROM events),
             |agg AS (SELECT user_id, count(x) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
             |  FROM base WHERE y IS NOT NULL GROUP BY user_id)
             |SELECT user_id,
             |  CASE WHEN n >= 2 AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
             |            AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
             |    sign(n * sxy - sx * sy) * CAST(abs(n * sxy - sx * sy) AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS autocorr
             |FROM agg""".stripMargin)),

    // to_numeric(errors='coerce'): unparseable → null via try_cast.
    QueryDef("to_numeric_coerce",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        expr("try_cast(source AS INT)").as("whole"),
        expr("try_cast(substr(source, 4) AS INT)").as("suffix")),
      Some("""SELECT doc_id, TRY_CAST(source AS INT) AS whole,
             |  TRY_CAST(substr(source, 4) AS INT) AS suffix
             |FROM documents""".stripMargin)),

    // str.partition(' '): (head, sep-implicit, rest); no-separator rows
    // degrade to (whole, '') in both engines.
    QueryDef("str_partition",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        substring_index(col("text"), " ", 1).as("head"),
        when(length(col("text")) > length(substring_index(col("text"), " ", 1)),
          expr("substr(text, length(substring_index(text, ' ', 1)) + 2)"))
          .otherwise(lit("")).as("rest")),
      Some("""SELECT doc_id, split_part(text, ' ', 1) AS head,
             |  CASE WHEN length(text) > length(split_part(text, ' ', 1))
             |    THEN substr(text, length(split_part(text, ' ', 1)) + 2)
             |    ELSE '' END AS rest
             |FROM documents""".stripMargin)),

    // shift(freq=) / tshift: index arithmetic, no data movement.
    QueryDef("dt_shift_freq",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 2 DAYS")).as("plus2d"),
        (col("o_orderdate") - expr("INTERVAL 3 HOURS")).as("minus3h")),
      Some("""SELECT o_orderkey, o_orderdate + INTERVAL 2 DAY AS plus2d,
             |  o_orderdate - INTERVAL 3 HOUR AS minus3h
             |FROM orders""".stripMargin)),

    // to_timedelta / timestamp difference: duration arithmetic surfaced
    // as exact integer units (DayTimeInterval internally; µs on the
    // wire for oracle parity).
    QueryDef("dt_timedelta",
      (s, d) => {
        val w = RollingOps.ordered(Seq("user_id"), evOrder)
        val prev = lag(col("ts"), 1).over(w)
        T.events(s, d).select(col("event_id"),
          (unix_micros(col("ts")) - unix_micros(prev)).as("delta_us"),
          floor((unix_micros(col("ts")) - unix_micros(prev)) / 1000000L)
            .as("delta_s"))
      },
      Some("""SELECT event_id,
             |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS delta_us,
             |  (epoch_us(ts) - lag(epoch_us(ts), 1) OVER w) // 1000000 AS delta_s
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // to_datetime(unit='s'): epoch-second numbers → timestamps.
    QueryDef("dt_from_unit",
      (s, d) => T.events(s, d).select(col("event_id"),
        timestamp_seconds(lit(1704067200L) + col("event_id")).as("ts_s")),
      Some("""SELECT event_id,
             |  CAST(to_timestamp(1704067200 + event_id) AS TIMESTAMP) AS ts_s
             |FROM events""".stripMargin)),

    // dt.is_quarter_start/end, is_year_start/end flags.
    QueryDef("dt_period_flags",
      (s, d) => {
        val dt = col("o_orderdate").cast("date")
        T.orders(s, d).select(col("o_orderkey"),
          (dt === date_trunc("quarter", col("o_orderdate")).cast("date"))
            .as("is_q_start"),
          (dt === date_sub(add_months(
            date_trunc("quarter", col("o_orderdate")).cast("date"), 3), 1))
            .as("is_q_end"),
          (month(dt) === 1 && dayofmonth(dt) === 1).as("is_y_start"),
          (month(dt) === 12 && dayofmonth(dt) === 31).as("is_y_end"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) = CAST(date_trunc('quarter', o_orderdate) AS DATE)
             |    AS is_q_start,
             |  CAST(o_orderdate AS DATE) =
             |    CAST(date_trunc('quarter', o_orderdate) AS DATE) + INTERVAL 3 MONTH - INTERVAL 1 DAY
             |    AS is_q_end,
             |  month(o_orderdate) = 1 AND day(o_orderdate) = 1 AS is_y_start,
             |  month(o_orderdate) = 12 AND day(o_orderdate) = 31 AS is_y_end
             |FROM orders""".stripMargin)),

    // nunique(axis=1): distinct non-null values per row over a fixed
    // column set — array ops, no pivot.
    QueryDef("nunique_axis1",
      (s, d) => {
        val arr = array(col("l_returnflag"), col("l_linestatus"),
          when(col("l_quantity") > 25, col("l_returnflag")))
        T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          size(array_distinct(filter(arr, x => x.isNotNull))).as("n_uniq"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  len(list_distinct(list_filter(
             |      [l_returnflag, l_linestatus,
             |       CASE WHEN l_quantity > 25 THEN l_returnflag END],
             |      x -> x IS NOT NULL))) AS n_uniq
             |FROM lineitem""".stripMargin)),

    // reductions with skipna=False: null-poisoning sums (pandas
    // sum(skipna=False)) — null if ANY input in the group is null.
    QueryDef("sum_skipna_false",
      (s, d) => {
        val masked = when(col("value") < 5, lit(null)).otherwise(dec2(col("value")))
        T.events(s, d).withColumn("m", masked)
          .groupBy("event_type")
          .agg(when(count(col("m")) === count(lit(1)),
            sum(col("m")).cast("double")).as("strict_sum"))
      },
      Some("""SELECT event_type,
             |  CASE WHEN count(m) = count(*) THEN CAST(sum(m) AS DOUBLE) END AS strict_sum
             |FROM (SELECT event_type,
             |    CASE WHEN value < 5 THEN NULL ELSE CAST(value AS DECIMAL(12,2)) END AS m
             |  FROM events) GROUP BY event_type""".stripMargin)),

    // frame.dot matmul (reference: core/frame.py:1193 DataFrame.dot —
    // np.dot on the whole matrix in RAM) at the scale shape: melt each
    // operand to (id, pos, value) triplets, join on pos, sum-aggregate.
    // Neither matrix ever sits on one node and Catalyst broadcasts the
    // small side of the pos join. Values quantize to a 2^-10 grid and
    // the dot runs in INTEGER units (max |sum| = dims·2^20 ≪ 2^53), so
    // every partial sum is exact and distributed summation order cannot
    // perturb the hash — no cross-engine rounding games.
    QueryDef("frame_dot",
      (s, d) => {
        val m = T.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), col("pos"),
            round(col("col").cast("double") * 1024).cast("long").as("v"))
        val a = m.filter(col("vec_id") < 3)
          .select(col("vec_id").as("id_a"), col("pos"), col("v").as("va"))
        val b = m.filter(col("vec_id").between(3, 6))
          .select(col("vec_id").as("id_b"), col("pos"), col("v").as("vb"))
        a.join(b, "pos").groupBy("id_a", "id_b")
          .agg(sum(col("va") * col("vb")).as("dot_u"))
      },
      Some("""WITH m AS (
             |  SELECT vec_id, u.pos,
             |    CAST(round(CAST(u.v AS DOUBLE) * 1024) AS BIGINT) AS v
             |  FROM (SELECT vec_id, unnest(embedding) AS v,
             |          generate_subscripts(embedding, 1) AS pos
             |        FROM embeddings) u(vec_id, v, pos)),
             |a AS (SELECT vec_id AS id_a, pos, v AS va FROM m WHERE vec_id < 3),
             |b AS (SELECT vec_id AS id_b, pos, v AS vb FROM m
             |      WHERE vec_id BETWEEN 3 AND 6)
             |SELECT id_a, id_b, CAST(sum(va * vb) AS BIGINT) AS dot_u
             |FROM a JOIN b USING (pos) GROUP BY id_a, id_b""".stripMargin))
  )
}

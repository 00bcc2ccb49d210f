package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Datetime accessor surface (SURVEY §2.9 dt block; reference:
  * pandas/core/indexes/accessors.py:117 DatetimeProperties, fields
  * kernel _libs/tslibs/fields.pyx; to_datetime core/tools/datetimes.py:373).
  *
  * dayofweek is normalized to pandas/DuckDB numbering (0=Sunday…) from
  * Spark's 1=Sunday…
  */
object DatetimeQueries extends QueryModule {

  private val T = Tables

  def defs: Seq[QueryDef] = Seq(

    QueryDef("dt_fields",
      (s, d) => T.events(s, d).select(col("event_id"),
        year(col("ts")).as("y"), month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"), second(col("ts")).as("sec"),
        (dayofweek(col("ts")) - 1).as("dow"),
        dayofyear(col("ts")).as("doy"), quarter(col("ts")).as("q")),
      Some("""SELECT event_id, year(ts) AS y, month(ts) AS mo, day(ts) AS dom,
             |  hour(ts) AS h, minute(ts) AS mi, CAST(second(ts) AS INT) AS sec,
             |  dayofweek(ts) AS dow, dayofyear(ts) AS doy, quarter(ts) AS q
             |FROM events""".stripMargin)),

    // dt.is_month_start / is_month_end / is_quarter_start / is_year_end
    // boundary predicates (reference datetimes accessor arrays) — pure
    // calendar arithmetic, scan-local.
    QueryDef("dt_predicates",
      (s, d) => T.events(s, d).select(col("event_id"),
        (dayofmonth(col("ts")) === 1).as("is_month_start"),
        (col("ts").cast("date") === last_day(col("ts"))).as("is_month_end"),
        (dayofmonth(col("ts")) === 1 && month(col("ts")).isin(1, 4, 7, 10))
          .as("is_quarter_start"),
        (month(col("ts")) === 12 && dayofmonth(col("ts")) === 31)
          .as("is_year_end"),
        (dayofweek(col("ts")).isin(1, 7)).as("is_weekend")),
      Some("""SELECT event_id,
             |  day(ts) = 1 AS is_month_start,
             |  CAST(ts AS DATE) = last_day(CAST(ts AS DATE)) AS is_month_end,
             |  day(ts) = 1 AND month(ts) IN (1, 4, 7, 10) AS is_quarter_start,
             |  month(ts) = 12 AND day(ts) = 31 AS is_year_end,
             |  dayofweek(ts) IN (0, 6) AS is_weekend
             |FROM events""".stripMargin)),

    QueryDef("dt_trunc",
      (s, d) => T.events(s, d).select(col("event_id"),
        date_trunc("hour", col("ts")).as("t_hour"),
        date_trunc("day", col("ts")).as("t_day"),
        date_trunc("week", col("ts")).as("t_week"),
        date_trunc("month", col("ts")).as("t_month")),
      Some("""SELECT event_id, date_trunc('hour', ts) AS t_hour,
             |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS t_day,
             |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS t_week,
             |  CAST(date_trunc('month', ts) AS TIMESTAMP) AS t_month
             |FROM events""".stripMargin)),

    QueryDef("dt_format",
      (s, d) => T.events(s, d).select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fmt")),
      Some("SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS fmt FROM events")),

    QueryDef("dt_arith",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        (col("o_orderdate") + expr("interval 3 days")).as("plus3d"),
        add_months(col("o_orderdate"), 2).cast("timestamp").as("plus2mo"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).as("days_to_y2k")),
      Some("""SELECT o_orderkey, o_orderdate + INTERVAL '3 days' AS plus3d,
             |  o_orderdate + INTERVAL '2 months' AS plus2mo,
             |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
             |FROM orders""".stripMargin)),

    QueryDef("dt_epoch",
      (s, d) => T.events(s, d).select(col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        unix_micros(col("ts")).as("epoch_us")),
      Some("""SELECT event_id, epoch_us(ts) // 1000000 AS epoch_s,
             |  epoch_us(ts) AS epoch_us
             |FROM events""".stripMargin)),

    QueryDef("dt_month_bounds",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        last_day(col("o_orderdate")).as("eom"),
        (dayofmonth(col("o_orderdate")) === 1).as("is_month_start"),
        (col("o_orderdate").cast("date") === last_day(col("o_orderdate")))
          .as("is_month_end")),
      Some("""SELECT o_orderkey, last_day(CAST(o_orderdate AS DATE)) AS eom,
             |  day(o_orderdate) = 1 AS is_month_start,
             |  CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) AS is_month_end
             |FROM orders""".stripMargin)),

    // to_datetime round-trip through an explicit format.
    QueryDef("dt_parse_roundtrip",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        to_timestamp(date_format(col("o_orderdate"), "MM/dd/yyyy"), "MM/dd/yyyy")
          .as("parsed")),
      Some("""SELECT o_orderkey,
             |  strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS parsed
             |FROM orders""".stripMargin)),

    // date_range: sequence + explode (reference core/indexes/datetimes.py:1375).
    QueryDef("date_range_days",
      (s, d) => {
        import s.implicits._
        s.range(1).select(explode(sequence(
          lit("2024-01-01").cast("timestamp"),
          lit("2024-03-01").cast("timestamp"),
          expr("interval 1 day"))).as("day"))
      },
      Some("""SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
             |  TIMESTAMP '2024-03-01', INTERVAL '1 day')) AS day""".stripMargin)),

    // timedelta_range (reference indexes/timedeltas.py:660): durations as
    // BIGINT micros — 50 half-day steps from 1 day.
    QueryDef("timedelta_range",
      (s, d) => graft.operators.RangeOps
        .timedeltaRange(s, 86400000000L, 43200000000L, 50),
      Some("""SELECT unnest(generate_series(86400000000,
             |  86400000000 + 49 * 43200000000, 43200000000)) AS td_us""".stripMargin)),

    // period_range(freq='M') (reference indexes/period.py:996): monthly
    // periods with their start instant and yyyy-MM label.
    QueryDef("period_range",
      (s, d) => graft.operators.RangeOps
        .periodRange(s, "2023-01-01", "2024-12-01", "interval 1 month", "yyyy-MM"),
      Some("""SELECT p AS period_start, strftime(p, '%Y-%m') AS period
             |FROM (SELECT unnest(generate_series(TIMESTAMP '2023-01-01',
             |  TIMESTAMP '2024-12-01', INTERVAL '1 month')) AS p)""".stripMargin)),

    // interval_range (reference indexes/interval.py:1091): half-open
    // [left, right) numeric bins.
    QueryDef("interval_range",
      (s, d) => graft.operators.RangeOps.intervalRange(s, 0.0, 500.0, 12.5),
      Some("""SELECT 0.0 + k * 12.5 AS left, 0.0 + (k + 1) * 12.5 AS right
             |FROM (SELECT unnest(generate_series(0, 39, 1)) AS k)""".stripMargin))
  )
}

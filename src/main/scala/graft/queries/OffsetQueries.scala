package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Offsets
import org.apache.spark.sql.functions._

/** Anchored-frequency resample / shift / range queries (SURVEY §2.9
  * datetime offsets + §2.10 resample rules; reference
  * pandas/tseries/offsets.py:445-2098, resample.py TimeGrouper with
  * anchored W-/Q-/A- rules; semantics cross-checked against pandas
  * directly — see OffsetsSpec).
  *
  * All labels are closed-form DATE arithmetic (Offsets) evaluated in the
  * scan stage; the aggregations are ordinary hash aggs on the label —
  * the same one-shuffle shape as plain resample, so anchoring is free at
  * 100 TB.
  */
object OffsetQueries extends QueryModule {

  private val T = Tables
  import Q._

  def defs: Seq[QueryDef] = Seq(

    // resample('W-SUN') on event timestamps: weekly bins (Mon..Sun] by
    // date, labeled by their Sunday (pandas closed='right'/label='right'
    // weekly default with the end-of-day edge adjustment).
    QueryDef("resample_weekly_anchored",
      (s, d) => T.events(s, d)
        .groupBy(Offsets.weekAnchorLabel(to_date(col("ts")), 6).as("week_end"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value")),
      Some(s"""SELECT ${Offsets.weekAnchorLabelSql("ts", 6)} AS week_end,
              |  count(*) AS cnt, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // resample('W-SUN', closed='left', label='left'): rollback bucketing
    // — weeks [anchor, next anchor) by date, labeled by their start.
    QueryDef("resample_weekly_left",
      (s, d) => T.events(s, d)
        .groupBy(Offsets.weekAnchorLabelBack(to_date(col("ts")), 6).as("week_start"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value")),
      Some(s"""SELECT ${Offsets.weekAnchorLabelBackSql("ts", 6)} AS week_start,
              |  count(*) AS cnt, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // resample('Q-NOV') fiscal quarters (ending Feb/May/Aug/Nov) plus the
    // containing A-JUN fiscal year — both anchored labels in one pass.
    QueryDef("resample_quarter_fiscal",
      (s, d) => T.orders(s, d)
        .groupBy(
          Offsets.quarterEndLabel(col("o_orderdate"), 11).as("q_end"),
          Offsets.yearEndLabel(col("o_orderdate"), 6).as("fy_end"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT ${Offsets.quarterEndLabelSql("o_orderdate", 11)} AS q_end,
              |  ${Offsets.yearEndLabelSql("o_orderdate", 6)} AS fy_end,
              |  count(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1, 2""".stripMargin)),

    // shift(freq=) through the anchored-offset algebra: Week(weekday=2),
    // MonthBegin, MonthEnd, QuarterEnd(startingMonth=12), YearEnd(month=6)
    // — on-anchor dates advance one full period (pandas `ts + offset`).
    QueryDef("shift_anchored_offsets",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        Offsets.shiftWeek(col("o_orderdate"), 2).as("next_wed"),
        Offsets.shiftMonthBegin(col("o_orderdate")).as("month_begin"),
        Offsets.shiftMonthEnd(col("o_orderdate")).as("month_end"),
        Offsets.shiftQuarterEnd(col("o_orderdate"), 12).as("quarter_end"),
        Offsets.shiftYearEnd(col("o_orderdate"), 6).as("fy_end")),
      Some(s"""SELECT o_orderkey,
              |  ${Offsets.shiftWeekSql("o_orderdate", 2)} AS next_wed,
              |  ${Offsets.shiftMonthBeginSql("o_orderdate")} AS month_begin,
              |  ${Offsets.shiftMonthEndSql("o_orderdate")} AS month_end,
              |  ${Offsets.shiftQuarterEndSql("o_orderdate", 12)} AS quarter_end,
              |  ${Offsets.shiftYearEndSql("o_orderdate", 6)} AS fy_end
              |FROM orders""".stripMargin)),

    // negative-n offsets (pandas `d - Offset()` rollback family):
    // previous anchor strictly before the date.
    QueryDef("shift_negative_offsets",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        Offsets.shiftWeek(col("o_orderdate"), 2, -1).as("prev_wed"),
        Offsets.shiftMonthBegin(col("o_orderdate"), -1).as("mbegin_m1"),
        Offsets.shiftMonthEnd(col("o_orderdate"), -2).as("mend_m2"),
        Offsets.shiftQuarterEnd(col("o_orderdate"), 12, -1).as("qend_m1"),
        Offsets.shiftYearEnd(col("o_orderdate"), 6, -1).as("yend_m1")),
      Some(s"""SELECT o_orderkey,
              |  ${Offsets.shiftWeekSql("o_orderdate", 2, -1)} AS prev_wed,
              |  ${Offsets.shiftMonthBeginSql("o_orderdate", -1)} AS mbegin_m1,
              |  ${Offsets.shiftMonthEndSql("o_orderdate", -2)} AS mend_m2,
              |  ${Offsets.shiftQuarterEndSql("o_orderdate", 12, -1)} AS qend_m1,
              |  ${Offsets.shiftYearEndSql("o_orderdate", 6, -1)} AS yend_m1
              |FROM orders""".stripMargin)),

    // CustomBusinessDay(calendar=USFederalHolidayCalendar()): the
    // holiday DATES come from rules (nth-weekday + observed fixed
    // dates, HolidayCalendar — pandas-pinned in HolidayCalendarSpec),
    // generated on the driver and inlined identically into both
    // engines. Window chosen so the calendar slice covers every roll.
    QueryDef("bday_us_federal",
      (s, d) => {
        val hol = graft.operators.HolidayCalendar.dates(
          graft.operators.HolidayCalendar.usFederal, "1995-06-01", "1996-07-31")
        T.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"),
            Offsets.shiftBusinessDay(col("o_orderdate"), hol).as("next_usbday"))
      },
      Some {
        val hol = graft.operators.HolidayCalendar.dates(
          graft.operators.HolidayCalendar.usFederal, "1995-06-01", "1996-07-31")
        s"""SELECT o_orderkey,
           |  ${Offsets.shiftBusinessDaySql("o_orderdate", hol)} AS next_usbday
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1995-07-01'
           |  AND o_orderdate < TIMESTAMP '1996-07-01'""".stripMargin
      }),

    // Period(freq='Q-NOV'/'A-JUN') fiscal labels (reference
    // indexes/period.py; Period.qyear/quarter): '1996Q1' for Dec 1995
    // under Q-NOV — fiscal year of the quarter end, quarter counted from
    // the fiscal year start. One hash agg over the label expressions.
    QueryDef("period_fiscal_labels",
      (s, d) => T.orders(s, d)
        .groupBy(
          Offsets.fiscalQuarterLabel(col("o_orderdate"), 11).as("fq"),
          Offsets.fiscalYear(col("o_orderdate"), 6).as("fy"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT ${Offsets.fiscalQuarterLabelSql("o_orderdate", 11)} AS fq,
              |  ${Offsets.fiscalYearSql("o_orderdate", 6)} AS fy,
              |  count(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1, 2""".stripMargin)),

    // n-period offsets (pandas `d + n*Offset()`) and
    // CustomBusinessDay(holidays) — the roll is unrolled to the worst
    // weekend+holiday chain, so the plan stays scan-local and bounded by
    // the calendar size. Window restricted to one fiscal year so three
    // holiday dates cover every row.
    QueryDef("shift_n_period_offsets",
      (s, d) => {
        val hol = Seq("1995-12-25", "1995-12-26", "1996-01-01")
        T.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"),
            Offsets.shiftWeek(col("o_orderdate"), 2, 2).as("wed2"),
            Offsets.shiftMonthBegin(col("o_orderdate"), 2).as("mbegin2"),
            Offsets.shiftMonthEnd(col("o_orderdate"), 3).as("mend3"),
            Offsets.shiftQuarterEnd(col("o_orderdate"), 12, 2).as("qend2"),
            Offsets.shiftYearEnd(col("o_orderdate"), 6, 2).as("yend2"),
            Offsets.shiftBusinessDay(col("o_orderdate"), hol).as("next_cbday"))
      },
      Some {
        val hol = Seq("1995-12-25", "1995-12-26", "1996-01-01")
        s"""SELECT o_orderkey,
           |  ${Offsets.shiftWeekSql("o_orderdate", 2, 2)} AS wed2,
           |  ${Offsets.shiftMonthBeginSql("o_orderdate", 2)} AS mbegin2,
           |  ${Offsets.shiftMonthEndSql("o_orderdate", 3)} AS mend3,
           |  ${Offsets.shiftQuarterEndSql("o_orderdate", 12, 2)} AS qend2,
           |  ${Offsets.shiftYearEndSql("o_orderdate", 6, 2)} AS yend2,
           |  ${Offsets.shiftBusinessDaySql("o_orderdate", hol)} AS next_cbday
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1995-07-01'
           |  AND o_orderdate < TIMESTAMP '1996-07-01'""".stripMargin
      }),

    // groupby(Grouper(key='ts', freq='1H'), 'user_id') — the unified
    // grouping spelling (reference core/groupby/grouper.py:30), exercised
    // through the PFrame API; plan-identical to grouped resample.
    QueryDef("grouper_freq_agg",
      (s, d) => {
        import graft.core.{Grouper, PFrame}
        PFrame(T.events(s, d))
          .groupby(Grouper("ts", "1H"), "user_id")
          .agg("cnt" -> count(lit(1)), "avg_value" -> davg(col("value")))
          .df
      },
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ts_bucket, user_id,
              |  count(*) AS cnt, ${davgSql("value")} AS avg_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // groupby(Grouper(freq='W-SUN')) — anchored rule through the same
    // unified spelling.
    QueryDef("grouper_freq_anchored",
      (s, d) => {
        import graft.core.{Grouper, PFrame}
        PFrame(T.events(s, d))
          .groupby(Grouper("ts", "W-SUN"))
          .agg("cnt" -> count(lit(1)), "sum_value" -> dsum(col("value")))
          .df
      },
      Some(s"""SELECT ${Offsets.weekAnchorLabelSql("ts", 6)} AS ts_bucket,
              |  count(*) AS cnt, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // SemiMonthEnd / SemiMonthBegin (pandas 15th + month-end / 1st +
    // 15th anchors) — pandas-pinned in OffsetsSpec.
    QueryDef("shift_semi_month",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        Offsets.shiftSemiMonthEnd(col("o_orderdate")).as("sm_end"),
        Offsets.shiftSemiMonthBegin(col("o_orderdate")).as("sm_begin")),
      Some(s"""SELECT o_orderkey,
              |  ${Offsets.shiftSemiMonthEndSql("o_orderdate")} AS sm_end,
              |  ${Offsets.shiftSemiMonthBeginSql("o_orderdate")} AS sm_begin
              |FROM orders""".stripMargin)),

    // BusinessHour: intraday business-time arithmetic (09:00-17:00
    // weekdays) over event timestamps with full microsecond
    // preservation — exact integer micros end-to-end; pandas-pinned.
    QueryDef("shift_business_hour",
      (s, d) => T.events(s, d).select(col("event_id"),
        Offsets.shiftBusinessHour(col("ts")).as("next_bh"),
        Offsets.shiftBusinessHour(col("ts"), 3).as("plus_3bh")),
      Some(s"""SELECT event_id,
              |  ${Offsets.shiftBusinessHourSql("ts", 1)} AS next_bh,
              |  ${Offsets.shiftBusinessHourSql("ts", 3)} AS plus_3bh
              |FROM events""".stripMargin)),

    // FY5253: 52/53-week retail fiscal year ending on the Saturday
    // nearest to (or last in) January — pandas-pinned.
    QueryDef("shift_fy5253",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        Offsets.shiftFY5253(col("o_orderdate"), 5, 1, "nearest").as("fy_nearest"),
        Offsets.shiftFY5253(col("o_orderdate"), 5, 1, "last").as("fy_last")),
      Some(s"""SELECT o_orderkey,
              |  ${Offsets.shiftFY5253Sql("o_orderdate", 5, 1, "nearest")} AS fy_nearest,
              |  ${Offsets.shiftFY5253Sql("o_orderdate", 5, 1, "last")} AS fy_last
              |FROM orders""".stripMargin)),

    // WeekOfMonth(week=1, weekday=2) = "2nd Wednesday" and
    // LastWeekOfMonth(weekday=4) = "last Friday" — pandas-pinned.
    QueryDef("shift_week_of_month",
      (s, d) => T.orders(s, d).select(col("o_orderkey"),
        Offsets.shiftWeekOfMonth(col("o_orderdate"), 1, 2).as("wom_2wed"),
        Offsets.shiftLastWeekOfMonth(col("o_orderdate"), 4).as("lwom_fri")),
      Some(s"""SELECT o_orderkey,
              |  ${Offsets.shiftWeekOfMonthSql("o_orderdate", 1, 2)} AS wom_2wed,
              |  ${Offsets.shiftLastWeekOfMonthSql("o_orderdate", 4)} AS lwom_fri
              |FROM orders""".stripMargin)),

    // date_range(freq='Q-NOV'): anchored quarter-end sequence — the
    // rollforward label of the start, then +3-month last_days.
    QueryDef("date_range_quarter_fiscal",
      (s, d) => s.range(1)
        .select(explode(sequence(lit(0), lit(12))).as("k"))
        .select(last_day(add_months(
          Offsets.quarterEndLabel(lit("1995-01-01").cast("date"), 11),
          (col("k") * 3).cast("int"))).as("q_end"))
        .filter(col("q_end") <= lit("1997-12-31").cast("date")),
      Some(s"""SELECT q_end FROM (
              |  SELECT last_day((${Offsets.quarterEndLabelSql("DATE '1995-01-01'", 11)})
              |    + to_months(CAST(3 * k AS INTEGER))) AS q_end
              |  FROM (SELECT unnest(generate_series(0, 12)) AS k))
              |WHERE q_end <= DATE '1997-12-31'""".stripMargin)),

    // bdate_range(holidays=US federal): weekday grid minus the
    // rule-generated calendar.
    QueryDef("bdate_range_holidays",
      (s, d) => {
        val hol = graft.operators.HolidayCalendar.dates(
          graft.operators.HolidayCalendar.usFederal, "1995-12-01", "1996-01-31")
        graft.operators.RangeOps.bdateRange(s, "1995-12-01", "1996-01-31")
          .filter(!col("ts").cast("date").cast("string").isInCollection(hol))
          .select(col("ts").cast("date").as("bday"))
      },
      Some {
        val hol = graft.operators.HolidayCalendar.dates(
          graft.operators.HolidayCalendar.usFederal, "1995-12-01", "1996-01-31")
        s"""SELECT CAST(d AS DATE) AS bday FROM
           |  (SELECT unnest(generate_series(TIMESTAMP '1995-12-01',
           |     TIMESTAMP '1996-01-31', INTERVAL 1 DAY)) AS d)
           |WHERE dayofweek(CAST(d AS DATE)) NOT IN (0, 6)
           |  AND CAST(CAST(d AS DATE) AS VARCHAR) NOT IN (${hol.map(h => s"'$h'").mkString(", ")})""".stripMargin
      }),

    // date_range(freq='W-WED'): Wednesdays from the first anchor at or
    // after the start — sequence() + explode, generated distributively.
    QueryDef("date_range_weekly_anchored",
      (s, d) => s.range(1).select(explode(sequence(
          Offsets.weekAnchorLabel(lit("2024-01-01").cast("date"), 2),
          lit("2024-06-30").cast("date"),
          expr("interval 7 days"))).as("wed")),
      Some("""SELECT CAST(unnest(generate_series(DATE '2024-01-03',
             |  DATE '2024-06-30', INTERVAL 7 DAY)) AS DATE) AS wed""".stripMargin))
  )
}

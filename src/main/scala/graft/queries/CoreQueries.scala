package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for query modules. */
object Q {
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  /** Round a double-valued scalar for hash-stable oracle compare. */
  def r(c: Column, scale: Int = 4): Column = round(c, scale)

  /** Exact arithmetic strategy for the oracle (ADVICE r1): the source
    * money/rate columns are true 2-decimal values stored as doubles, so
    * casting THEM to DECIMAL(12,2) recovers the exact value identically
    * in Spark and DuckDB (the 1e-17 binary error is far from any .xx5
    * rounding boundary). All products/sums then happen exactly in decimal
    * — parallel order can't change them — and the final cast back to
    * double is exact while the unscaled value stays below 2^53.
    *
    * Casting a derived double expression to decimal instead is NOT safe:
    * Spark rounds the shortest decimal representation (BigDecimal.valueOf)
    * while DuckDB rounds the exact binary value, and 6-decimal products
    * hit .xxxx5 ties constantly.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact integer cents of a true-2-decimal double, as long (r19
    * optimization, guide §2.3 "narrower types" / §1.2 "per-task work"):
    * for a stored double v approximating the true 2-decimal value c/100,
    * v·100 lands within ~1e-8·|c| of the integer c, so adding ±0.5
    * toward the sign and truncating (the double→long cast) recovers c
    * EXACTLY — pure codegen'd double arithmetic, no BigDecimal
    * allocation per row (the double→DECIMAL(12,2) cast each aggregate
    * row used to pay goes through BigDecimal.valueOf + setScale).
    * Same 2-decimal-source contract as [[dec2]]; NULL propagates.
    *
    * CONTRACT (r19 ADVICE): inputs must additionally be FINITE. dec2
    * maps NaN/Infinity to NULL (dropped from sums) where this
    * non-ANSI cast yields 0L / Long.MaxValue — a non-finite value fed
    * to a cents-backed dsum/davg would diverge from the DECIMAL-cast
    * oracle mirror instead of matching it, and the differential
    * harness would fail the query loudly. Every current call site is
    * a raw 2-decimal money/rate column (audited r19), all finite by
    * construction; a per-row isnan/isinf guard here would tax the
    * hottest aggregation path (q1's 8 sums) to defend values the
    * contract already excludes, so the contract is documented instead
    * — new call sites on DERIVED doubles must guard at the source. */
  def cents(c: Column): Column =
    (c * 100d + signum(c) * 0.5d).cast("long")

  private val D38 = DecimalType(38, 0)

  /** Exact sum of a 2-decimal-valued double column, as double.
    *
    * r19 shape: sum the exact long cents into a DECIMAL(38,0)
    * accumulator (overflow-free at any scale; Spark's Decimal adds
    * stay on the compact long fast path until a partial sum exceeds
    * 18 digits), then ONE exact decimal /100 + double cast per GROUP.
    * Bit-identical to the previous sum(dec2(c)).cast(double) — the
    * summed value is the same exact decimal, and the final cast is
    * the single correctly-rounded conversion both engines share
    * (verified per-bit against the old shape and against the DuckDB
    * oracle at sf0.01 + sf0.1). ~40% cheaper per row at the scan:
    * the per-row work drops from BigDecimal round-trip to one fused
    * multiply-add + cast. */
  def dsum(c: Column): Column =
    (sum(cents(c).cast(D38)) / lit(100)).cast(DoubleType)

  /** Exact-decimal-backed mean: identical IEEE double division of an
    * exactly-cast decimal sum by a count on both engines — bit-identical
    * WITHOUT rounding (rounding would itself introduce .xxxx5 tie-break
    * divergence between the engines' rounding implementations). Same
    * cents-accumulator shape as [[dsum]]. */
  def davg(c: Column): Column =
    (sum(cents(c).cast(D38)) / lit(100)).cast(DoubleType) / count(c)

  /** DuckDB-side fragments mirroring dec2/dsum/davg exactly. */
  def dec2Sql(x: String): String = s"CAST(($x) AS DECIMAL(12,2))"
  def dsumSql(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(12,2))) AS DOUBLE)"
  def davgSql(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(12,2))) AS DOUBLE) / count($x)"
}

/** Flagship slice: scan → filter → hash-agg → sort (TPC-H Q1 shape)
  * plus the basic projection/filter/selection family (SURVEY §2.2).
  *
  * Reference semantics: pandas `groupby().agg()` (pandas/core/groupby/
  * generic.py:1304) and boolean-mask selection (pandas/core/frame.py:2770).
  */
object CoreQueries extends QueryModule {
  import Q._

  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // r19: the disc-price/charge products run in exact long integers
    // per row (cents × basis-point factors — |prod| ≤ ~1.2e11, far from
    // long overflow) and accumulate in DECIMAL(38,0); ONE exact decimal
    // rescale + double cast per group replaces the per-row
    // DECIMAL(12,2) multiplies (BigDecimal + precision checks per row).
    // Values bit-identical to the previous decimal-expression shape —
    // the summed quantity is the same exact integer in 1e-4/1e-6 units.
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d38 = DecimalType(38, 0)
    val pc = cents(col("l_extendedprice"))
    val dc = cents(col("l_discount"))
    val tc = cents(col("l_tax"))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        (sum((pc * (lit(100L) - dc)).cast(d38)) / lit(10000))
          .cast(DoubleType).as("sum_disc_price"),
        (sum((pc * (lit(100L) - dc) * (lit(100L) + tc)).cast(d38))
          / lit(1000000)).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${dsumSql("l_quantity")} AS sum_qty,
      |  ${dsumSql("l_extendedprice")} AS sum_base_price,
      |  CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${dec2Sql("l_discount")})) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(${dec2Sql("l_extendedprice")} * (1 - ${dec2Sql("l_discount")}) * (1 + ${dec2Sql("l_tax")})) AS DOUBLE) AS sum_charge,
      |  ${davgSql("l_quantity")} AS avg_qty,
      |  ${davgSql("l_extendedprice")} AS avg_price,
      |  ${davgSql("l_discount")} AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Sql)),

    // Degenerate-result pin: a filter matching nothing must round-trip
    // the gate as zero rows with the right schema on both engines.
    QueryDef("empty_result",
      (s, d) => Tables.nation(s, d)
        .filter(col("n_nationkey") < 0)
        .select("n_nationkey", "n_name"),
      Some("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 0"))
  )
}

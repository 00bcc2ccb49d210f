package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for query modules. */
object Q {
  /** Round a double-valued aggregate so that Spark's parallel (order-
    * nondeterministic) float summation and DuckDB's sequential one hash
    * identically. 4 decimals is far above double ULP error at these scales
    * while well below any data-significant digit.
    */
  def r(c: Column, scale: Int = 4): Column = round(c, scale)
}

/** Flagship slice: scan → filter → hash-agg → sort (TPC-H Q1 shape)
  * plus the basic projection/filter/selection family (SURVEY §2.2).
  *
  * Reference semantics: pandas `groupby().agg()` (pandas/core/groupby/
  * generic.py:1304) and boolean-mask selection (pandas/core/frame.py:2770).
  */
object CoreQueries extends QueryModule {
  import Q.r

  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r(sum("l_quantity")).as("sum_qty"),
        r(sum("l_extendedprice")).as("sum_base_price"),
        r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        r(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
        r(avg("l_quantity")).as("avg_qty"),
        r(avg("l_extendedprice")).as("avg_price"),
        r(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Sql))
  )
}

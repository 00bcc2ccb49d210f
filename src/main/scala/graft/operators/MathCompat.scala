package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas↔Spark arithmetic compat shims (SURVEY §2.9 divergences). */
object MathCompat {

  /** pandas division semantics: x/0 → ±inf, 0/0 → NaN (reference
    * core/missing.py:652 mask_zero_div_zero) — vs Spark ANSI, which
    * throws, and DuckDB, which yields NULL. Opt-in shim; the engine's
    * default (oracle-gated) behavior is null via try_divide. */
  def divPandas(a: Column, b: Column): Column =
    when(b =!= 0, a / b)
      .when(a > 0, lit(Double.PositiveInfinity))
      .when(a < 0, lit(Double.NegativeInfinity))
      .when(a === 0, lit(Double.NaN))
      .otherwise(lit(null)) // null numerator propagates

  /** Division-as-null (the engine default, matching the DuckDB oracle). */
  def divNull(a: Column, b: Column): Column = try_divide(a, b)
}

/** Options system (reference: pandas/core/config.py — 840 LoC of
  * get/set_option): a thin named-option layer over spark.conf with
  * engine defaults, so user code ports `pd.set_option` calls 1:1. */
final class EngineConf(spark: org.apache.spark.sql.SparkSession) {
  private val prefix = "graft."
  private val defaults = Map(
    "display.max_rows" -> "20",
    "mode.pandas_div" -> "false", // true → divPandas semantics in helpers
    "compute.shuffle_partitions" -> null)

  def set(key: String, value: String): Unit =
    key match {
      case "compute.shuffle_partitions" =>
        spark.conf.set("spark.sql.shuffle.partitions", value)
      case k => spark.conf.set(prefix + k, value)
    }

  def get(key: String): String = key match {
    case "compute.shuffle_partitions" =>
      spark.conf.get("spark.sql.shuffle.partitions")
    case k => spark.conf.get(prefix + k,
      Option(defaults.getOrElse(k, null))
        .getOrElse(sys.error(s"unknown option $k")))
  }

  def reset(key: String): Unit =
    if (key != "compute.shuffle_partitions") spark.conf.unset(prefix + key)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: a Spark plan builder plus (optionally)
  * the equivalent DuckDB SQL used by the driver as a differential oracle.
  *
  * Oracle-parity rules (driver sorts columns by name, then hashes values):
  *   - every computed column must carry the SAME alias in Spark and SQL;
  *   - double-valued aggregates are rounded on BOTH sides so parallel
  *     summation order cannot flip the hash (see `Q.r`).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}

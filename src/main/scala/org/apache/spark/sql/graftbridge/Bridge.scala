package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal access bridge: `Dataset.ofRows` is private[sql], and a custom
  * LogicalPlan needs exactly one entry point to become a public
  * DataFrame. This package object lives under org.apache.spark.sql so
  * the access qualifier resolves; nothing else from the internals is
  * touched.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-only visibility shim: SparkSessionExtensions' builders are
    * private[sql]; specs use this to assert what an extensions installer
    * actually injected. */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession) =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}

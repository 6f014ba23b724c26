package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so the engine can wrap
  * its custom logical plan nodes (graft.plans) as public DataFrames.
  * This is the standard extension-library pattern for constructing a
  * DataFrame from a custom LogicalPlan; the one-liner lives in the
  * spark.sql package solely to satisfy the access modifier.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}

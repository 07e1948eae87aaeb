package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset, SparkSession => ClassicSparkSession}

/** Bridge to Spark's private[sql] Dataset/logical-plan converters,
  * needed to expose custom LogicalPlan operators (graft.plans.*)
  * through the public DataFrame API. Lives in an org.apache.spark.sql
  * subpackage solely for access; contains no Spark-derived code.
  */
object PlanBridge {

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataFrame].queryExecution.analyzed
}

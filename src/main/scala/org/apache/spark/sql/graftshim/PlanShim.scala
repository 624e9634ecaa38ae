package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering

/** private[sql] bridges needed by graft's custom plan nodes. */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataFrame].logicalPlan

  def ordering(order: Seq[SortOrder], output: Seq[Attribute])
  : Ordering[org.apache.spark.sql.catalyst.InternalRow] =
    GenerateOrdering.generate(order, output)
}

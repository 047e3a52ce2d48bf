package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Second `private[sql]` doorway, for the SQL DML front: a parsed
  * MERGE source is a LogicalPlan (a view reference or a full
  * subquery), and the only way to evaluate an arbitrary plan as a
  * DataFrame is `Dataset.ofRows` — package-private to
  * `org.apache.spark.sql`. Like [[GraftStreamingShim]], no behavior
  * lives here.
  */
object GraftPlanShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

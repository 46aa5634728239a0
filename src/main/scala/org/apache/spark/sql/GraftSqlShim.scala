package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` DataFrame constructor so graft's custom
  * logical operators ([[graft.plans.AsOfJoin]]) can hand a plan to the
  * session exactly the way Spark's own API methods do. This is the
  * supported extension seam in spirit — `injectPlannerStrategy` plans
  * the node; this merely wraps it in a Dataset — and the only Spark
  * internal graft touches outside public extension points.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

package graft.sparkutil

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Public seam for turning a hand-built [[LogicalPlan]] into a DataFrame.
  *
  * Spark keeps `Dataset.ofRows` `private[sql]`; libraries that inject custom
  * logical operators conventionally expose it through a one-line accessor
  * (same pattern as public Spark-extension projects). Isolated here so the
  * rest of the codebase stays outside Spark's namespace.
  */
object DatasetFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, plan)
}

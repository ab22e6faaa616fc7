package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to `Dataset.ofRows` (which is `private[sql]`). Lives inside the
  * `org.apache.spark.sql` namespace purely as an access shim — the
  * conventional pattern for Spark extension libraries; no Spark internals
  * are modified.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketed-table co-located join: both sides bucketed on the join key →
  * the join plans WITHOUT a shuffle exchange. This is the SCALING.md claim
  * that repeated fact-fact joins at 100 TB amortize their shuffle into the
  * table layout — proven here on the actual physical plan.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans with no shuffle exchange") {
    // (warehouse dir is a static conf — tables land in the session default
    // and are dropped in the finally)
    // disable broadcast so the join strategy decision is about shuffles
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(spark, TestSpark.sf)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      Tables.lineitem(spark, TestSpark.sf)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = Tables.lineitem(spark, TestSpark.sf)
        .join(Tables.orders(spark, TestSpark.sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}

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
  import spark.implicits._

  test("incremental dedup against a persisted bucketed fingerprint corpus never shuffles the corpus") {
    import graft.operators.Dedup
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at 100 TB the corpus side is never broadcastable; force that regime
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, TestSpark.sf)
      // run N: persist corpus fingerprints bucketed by fp
      Dedup.writeCorpusFingerprints(docs.filter(col("doc_id") < 400), "corpus_fp")
      // run N+1: anti-join the new batch against the persisted table
      val out = Dedup.incrementalAgainstCorpus(
        spark, docs.filter(col("doc_id") >= 400), "corpus_fp")
      val plan = out.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected ONE exchange (batch side only, corpus bucket-aligned), got $exchanges:\n$plan")
      // and the operational path computes exactly what the in-query split does
      val expected = Dedup.incremental(spark, TestSpark.sf)
        .as[(Long, String)].collect().toSet
      assert(out.as[(Long, String)].collect().toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS corpus_fp")
    }
  }

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

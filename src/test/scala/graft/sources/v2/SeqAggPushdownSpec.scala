package graft.sources.v2

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit contract of the connector's `SupportsPushDownAggregates` path —
  * the cases the registry query (grouped count/sum/min/max over the
  * filtered range) doesn't reach: ungrouped (global) aggregates, the
  * unsupported-function bail-out, and value equivalence against the
  * row-scan plan computed WITHOUT pushdown.
  */
class SeqAggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seq(n: Long, parts: Int) =
    spark.read.format("graft.sources.v2.SeqSource")
      .option("n", n.toString).option("parts", parts.toString).load()

  test("global (ungrouped) aggregate pushes: one partial row per partition") {
    val df = seq(10000, 4).agg(
      count(lit(1)).as("n"), min("val").as("mn"), max("val").as("mx"), sum("id").as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("aggPushed=[count(id), min(val), max(val), sum(id)] groupBy=[]"),
      s"global aggregate must fold into the scan, got:\n$p")
    val r = df.collect()(0)
    assert(r.getAs[Long]("n") == 10000L)
    assert(r.getAs[Long]("s") == 10000L * 9999 / 2)
    // brute-force the min/max from the value formula
    val vals = (0L until 10000L).map(SeqSource.valueOf)
    assert(r.getAs[Long]("mn") == vals.min && r.getAs[Long]("mx") == vals.max)
  }

  test("pushdown composes with the id-range filter: partials fold the narrowed range only") {
    val df = seq(10000, 4).filter(col("id") >= 9000).agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[9000,10000)") && p.contains("aggPushed=[count(id)]"))
    assert(df.collect()(0).getAs[Long]("n") == 1000L)
  }

  test("unsupported shapes bail out to the row scan (avg, distinct sum, non-bucket grouping)") {
    // avg is not translated by the connector; the whole aggregation must
    // stay in Spark over the plain row scan
    val avg = seq(1000, 2).agg(org.apache.spark.sql.functions.avg("val").as("a"))
    assert(!avg.queryExecution.executedPlan.toString.contains("aggPushed"),
      "avg must not push — connector only folds count/sum/min/max")
    val dsum = seq(1000, 2).agg(sum_distinct(col("val")).as("s"))
    assert(!dsum.queryExecution.executedPlan.toString.contains("aggPushed"),
      "distinct sum must not push — partials can't dedup across partitions")
    val gval = seq(1000, 2).groupBy(col("val")).agg(count(lit(1)).as("n"))
    assert(!gval.queryExecution.executedPlan.toString.contains("aggPushed"),
      "grouping on a non-bucket column must fall back to the row scan")
  }

  test("pushed grouped results equal the row-scan plan with pushdown off (value equivalence)") {
    val grouped = seq(50000, 8).groupBy("bucket").agg(
      count(lit(1)).as("n"), sum("val").as("s"), min("val").as("mn"), max("val").as("mx"))
    assert(grouped.queryExecution.executedPlan.toString.contains("aggPushed"))
    // same aggregate forced through the row path: group on a derived copy
    // of bucket so pushAggregation rejects it (non-NamedReference group;
    // pmod(bucket, 64) == bucket valuewise but doesn't constant-fold away
    // like `bucket + 0` does)
    val rowPath = seq(50000, 8)
      .withColumn("b2", pmod(col("bucket"), lit(64L)))
      .groupBy("b2").agg(
        count(lit(1)).as("n"), sum("val").as("s"), min("val").as("mn"), max("val").as("mx"))
      .withColumnRenamed("b2", "bucket")
    assert(!rowPath.queryExecution.executedPlan.toString.contains("aggPushed"))
    val a = grouped.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val b = rowPath.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(a == b, "partial fold + final merge must equal the plain group-by")
  }

  test("empty narrowed range emits zero partial rows (no sentinel corruption)") {
    val df = seq(1000, 4).filter(col("id") >= 5000).groupBy("bucket").agg(min("val").as("mn"))
    assert(df.collect().isEmpty,
      "empty partitions must emit nothing — a 0-count sentinel row would fabricate groups")
  }
}

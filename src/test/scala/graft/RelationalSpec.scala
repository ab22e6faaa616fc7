package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Skew}
import graft.sources.Tables

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact") {
    val approx = Relational.aggApproxDistinct(spark, TestSpark.sf)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(1, ex / 20),
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("salted join is row-identical to the plain join") {
    val l = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_orderpriority")
    val plain = l.join(o, "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedJoin(l, o, "o_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .as[(String, Long, Double)].collect().toSet
    assert(plain == salted)
  }

  test("broadcast join plan actually broadcasts the dims") {
    val plan = Relational.joinBroadcast(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("filter and projection push into the parquet scan") {
    val plan = Relational.filterProject(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected pushed filters in:\n$plan")
    // scan must not read the full 11-column lineitem schema
    assert(!plan.contains("l_returnflag"), "projection pruning failed: scan reads unused column")
  }

  test("topk plans as TakeOrderedAndProject, not a full sort") {
    val plan = Relational.topkOrders(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-K plan in:\n$plan")
  }
}

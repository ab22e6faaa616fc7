package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SqlModern

/** Semantics of the modern-SQL-surface queries beyond the oracle gate. */
class SqlModernSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("recursive_cte: depth equals the number of div-8 steps to zero") {
    val rows = SqlModern.recursiveCte(spark, sf)
      .filter(col("k").isin(1L, 8L, 64L, 100L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 1 -> 0 (1 step), 8 -> 1 -> 0 (2), 64 -> 8 -> 1 -> 0 (3), 100 -> 12 -> 1 -> 0 (3)
    assert(rows(1L) == 1 && rows(8L) == 2 && rows(64L) == 3 && rows(100L) == 3)
  }

  test("variant_json: mixed-type field counts numerics only for even keys") {
    import spark.implicits._
    val agg = SqlModern.variantJson(spark, sf)
      .agg(sum("n").as("n"), sum("n_numeric_v").as("nv")).as[(Long, Long)].head()
    val total = graft.sources.Tables.orders(spark, sf).count()
    val even = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 2 === 0).count()
    assert(agg._1 == total, "every order must extract")
    assert(agg._2 == even, "try_variant_get long must hit exactly the even keys")
  }

  test("collation_group: UTF8_LCASE merges all three case manglings per segment") {
    val rows = SqlModern.collationGroup(spark, sf).collect()
    assert(rows.length == 5, "the 15 binary-distinct spellings must collapse to 5 segments")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_spellings") == 3L,
        s"${r.getAs[String]("segment")}: each collated group must contain all 3 case " +
          "variants — anything else means the collation didn't drive the grouping")
      assert(r.getAs[String]("segment") == r.getAs[String]("segment").toUpperCase,
        "output representative must be the normalized (upper) spelling")
    }
  }

  test("collation_group: equality under UTF8_LCASE vs binary on the same values") {
    import spark.implicits._
    // direct semantics probe of the collation itself, independent of fixtures
    val r = spark.sql(
      """SELECT 'BUILDING' COLLATE UTF8_LCASE = 'building' COLLATE UTF8_LCASE AS ci,
        |       'BUILDING' = 'building' AS bin""".stripMargin)
      .as[(Boolean, Boolean)].head()
    assert(r._1 && !r._2)
  }

  test("sql_parameterized: binding is typed — date param prunes like a DATE literal") {
    val df = SqlModern.sqlParameterized(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the analyzed plan must contain no parameter markers after binding
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains(":grp") && !analyzed.contains("parameter"),
      "named parameters must be fully substituted at parse time")
  }

  test("sql_udf: Catalyst inlines the SQL function to plain CASE expressions") {
    val df = SqlModern.sqlUdf(spark, sf)
    // the alias keeps the function NAME; what must be gone is a CALL —
    // inlining leaves only CASE expressions over the column
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_band("),
      s"SQL UDF must be expanded at analysis time, found call in:\n$plan")
    assert(plan.contains("CASE WHEN"), "inlined CASE expected in the plan")
    assert(df.count() == 3)
  }
}

package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function library breadth (SURVEY §2.2 "string/date/math/json"):
  * the reference's only scalar op is lowercase+strip
  * (`greeter_client.cc:316-321`); this module exercises the engine's wider
  * codegen'd function surface with DuckDB-mirrorable semantics.
  *
  * Everything here is a pure map-side projection (scan-speed at any scale);
  * GROUPING SETS goes through the SQL entry point and plans as a single
  * Expand + aggregate.
  */
object ScalarFunctions {

  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      substring(col("p_name"), 2, 3).as("name_sub"),
      expr("replace(p_type, ' ', '_')").as("type_snake"),
      lpad(col("p_size").cast("string"), 3, "0").as("size_padded"),
      length(col("p_name")).cast("long").as("name_len"),
      reverse(col("p_brand")).as("brand_rev"),
      expr("split_part(p_type, ' ', 1)").as("type_first"),
      concat(col("p_brand"), lit("#"), col("p_size")).as("brand_size"))

  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("days_since_epoch_start"))

  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        round(pow(lit(1.0) + col("l_discount"), 2), 4).as("disc_sq"),
        abs(col("l_quantity") - lit(25)).as("qty_dev"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"))

  /** Array/map function surface: constructors, ordering, extraction,
    * sequence generation, map round-trip — all codegen'd map-side
    * projections. The oracle mirrors each via DuckDB list functions (or
    * the algebraic identity where the construct is engine-specific, e.g.
    * `element_at(map(k→v), k) ≡ v`).
    */
  def arrayMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val arr = array(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        array_max(arr).as("arr_max"),
        array_min(arr).as("arr_min"),
        element_at(sort_array(arr), 1).as("arr_sorted_first"),
        size(sequence(lit(1), col("l_linenumber"))).cast("long").as("seq_n"),
        element_at(
          map(lit("qty"), col("l_quantity"), lit("tax"), col("l_tax")), "qty").as("m_qty"),
        array_contains(arr, col("l_quantity")).as("has_qty"))
  }

  /** GROUPING SETS ((status), (priority), ()) — finer-grained than
    * rollup/cube, via the SQL entry point.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Semi-structured extraction from the JSON `props` column. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_string_funcs" -> stringFuncs _,
    "scalar_date_funcs" -> dateFuncs _,
    "scalar_math_funcs" -> mathFuncs _,
    "scalar_array_map_funcs" -> arrayMapFuncs _,
    "grouping_sets" -> groupingSets _,
    "json_extract" -> jsonExtract _,
  )

  def oracle: Map[String, String] = Map(
    "scalar_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_upper,
        | substr(p_name, 2, 3) AS name_sub,
        | replace(p_type, ' ', '_') AS type_snake,
        | lpad(p_size::VARCHAR, 3, '0') AS size_padded,
        | length(p_name) AS name_len,
        | reverse(p_brand) AS brand_rev,
        | split_part(p_type, ' ', 1) AS type_first,
        | p_brand || '#' || p_size::VARCHAR AS brand_size
        |FROM part""".stripMargin,
    "scalar_date_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        | quarter(o_orderdate) AS q,
        | date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
        |FROM orders""".stripMargin,
    "scalar_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(ln(l_extendedprice), 4) AS ln_price,
        | round(sqrt(l_quantity), 4) AS sqrt_qty,
        | round(pow(1.0 + l_discount, 2), 4) AS disc_sq,
        | abs(l_quantity - 25) AS qty_dev,
        | greatest(l_tax, l_discount) AS max_rate,
        | floor(l_extendedprice)::BIGINT AS price_floor,
        | ceil(l_extendedprice)::BIGINT AS price_ceil,
        | l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin,
    "scalar_array_map_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | list_aggregate([l_quantity, l_extendedprice, l_discount], 'max') AS arr_max,
        | list_aggregate([l_quantity, l_extendedprice, l_discount], 'min') AS arr_min,
        | list_sort([l_quantity, l_extendedprice, l_discount])[1] AS arr_sorted_first,
        | l_linenumber::BIGINT AS seq_n,
        | l_quantity AS m_qty,
        | true AS has_qty
        |FROM lineitem WHERE l_orderkey <= 500""".stripMargin,
    "grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n,
        | sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        | round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin,
  )
}

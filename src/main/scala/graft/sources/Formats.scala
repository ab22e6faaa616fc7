package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet SOURCE coverage at the verified-query level: SinksSpec
  * proves CSV/JSON/ORC round-trips in-process, but a registry query must
  * also SCAN a non-parquet source under the driver's DuckDB oracle gate.
  * `csv_source_agg` does that: the orders fixture is exported once per run
  * through [[Sinks.writeCsv]] (distributed header'd CSV, one file per
  * partition), read back as a CSV SCAN with an EXPLICIT schema (the 100 TB
  * discipline — schema inference over CSV is a full extra pass), and
  * aggregated; DuckDB's `read_csv` over the same files is the oracle, so
  * the write→scan→aggregate chain is hash-gated end-to-end.
  *
  * The aggregate is count/min/max only — order-independent and exact under
  * text round-trip (both engines parse decimal text to nearest double), so
  * no summation-order or rounding-boundary risk.
  *
  * Scale posture: the CSV scan supports filter pushdown
  * (`spark.sql.csv.filterPushdown.enabled` defaults true — predicate
  * evaluated during parsing, non-matching rows never materialize) and the
  * explicit schema plus `columnPruning` parse only referenced columns.
  * Single-writer assumption: the export path is fixed per JVM run; Verify
  * and the oracle read it within the same run.
  */
object Formats {

  /** Fixed export path — embedded verbatim in the oracle SQL, so it must
    * be identical in the query and the `read_csv` call.
    */
  val CsvExportPath = "/tmp/graft_csv_export/orders_csv"

  val OrdersCsvSchema =
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING"

  /** Export orders → CSV, scan it back with an explicit schema, aggregate
    * urgent orders by status.
    */
  def csvSourceAgg(spark: SparkSession, dir: String): DataFrame = {
    Sinks.writeCsv(
      Tables.orders(spark, dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      CsvExportPath)
    spark.read
      .schema(OrdersCsvSchema)
      .option("header", "true")
      .csv(CsvExportPath)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_source_agg" -> csvSourceAgg _,
  )

  def oracle: Map[String, String] = Map(
    "csv_source_agg" ->
      s"""SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
         | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         |FROM read_csv('$CsvExportPath/*.csv', header=true,
         |  columns={'o_orderkey':'BIGINT','o_custkey':'BIGINT','o_orderstatus':'VARCHAR',
         |           'o_totalprice':'DOUBLE','o_orderpriority':'VARCHAR'})
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderstatus""".stripMargin,
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry of every verifiable query: each `queries` entry is a pure
  * `(SparkSession, fixtureDir) => DataFrame`, and (where SQL-expressible)
  * `oracleSql` carries the equivalent DuckDB SQL with IDENTICAL column names
  * so the driver's sorted-column hash compare matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextPipeline.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  private[graft] val namedModules: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      ("operators.TextQueries", TextQueries.queries, TextQueries.oracle),
      ("operators.SqlModern", SqlModern.queries, SqlModern.oracle),
      ("operators.Relational", Relational.queries, Relational.oracle),
      ("operators.Events", Events.queries, Events.oracle),
      ("functions.TextAnalysis", graft.functions.TextAnalysis.queries, graft.functions.TextAnalysis.oracle),
      ("functions.ScalarFunctions", graft.functions.ScalarFunctions.queries, graft.functions.ScalarFunctions.oracle),
      ("operators.Skew", Skew.queries, Skew.oracle),
      ("operators.Typed", Typed.queries, Typed.oracle),
      ("operators.Geo", Geo.queries, Geo.oracle),
      ("operators.Mining", Mining.queries, Mining.oracle),
      ("operators.Analytics", Analytics.queries, Analytics.oracle),
      ("operators.Dedup", Dedup.queries, Dedup.oracle),
      ("operators.Similarity", Similarity.queries, Similarity.oracle),
      ("operators.Multimodal", Multimodal.queries, Multimodal.oracle),
      ("streaming.EventStreams", graft.streaming.EventStreams.queries, graft.streaming.EventStreams.oracle),
      ("sources.Formats", graft.sources.Formats.queries, graft.sources.Formats.oracle),
    )

  private[graft] def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    namedModules.map { case (_, q, o) => (q, o) }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

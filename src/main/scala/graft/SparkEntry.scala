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

  private[graft] val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (TextQueries.queries, TextQueries.oracle),
      (SqlModern.queries, SqlModern.oracle),
      (Relational.queries, Relational.oracle),
      (Events.queries, Events.oracle),
      (graft.functions.TextAnalysis.queries, graft.functions.TextAnalysis.oracle),
      (graft.functions.ScalarFunctions.queries, graft.functions.ScalarFunctions.oracle),
      (Skew.queries, Skew.oracle),
      (Geo.queries, Geo.oracle),
      (Mining.queries, Mining.oracle),
      (Analytics.queries, Analytics.oracle),
      (Dedup.queries, Dedup.oracle),
      (Similarity.queries, Similarity.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (graft.streaming.EventStreams.queries, graft.streaming.EventStreams.oracle),
      (graft.sources.Formats.queries, graft.sources.Formats.oracle),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver-verifiable queries for the reference's own surface (SURVEY §2.1).
  * Each entry has a DuckDB oracle in [[oracle]] with identical column names
  * and deterministic values.
  */
object TextQueries {

  /** Shared DuckDB-dialect token CTE: must match [[TextPipeline.tokens]]
    * exactly (regexp_replace needs the 'g' flag in DuckDB; Spark replaces
    * globally by default).
    */
  private val tokensCte =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')), '\s+')) AS word
      |  FROM documents
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> ((s, d) =>
      TextPipeline.wordCount(Tables.documents(s, d))),
    "wordcount_topn" -> ((s, d) =>
      TextPipeline.topN(TextPipeline.wordCount(Tables.documents(s, d)), 20)),
    "tokenize" -> ((s, d) =>
      TextPipeline.tokenize(Tables.documents(s, d))),
    "normalize_project" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextPipeline.normalize(col("text")).as("norm_text"))),
  )

  def oracle: Map[String, String] = Map(
    "wordcount" ->
      s"$tokensCte SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word",
    "wordcount_topn" ->
      s"$tokensCte SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20",
    "tokenize" ->
      s"$tokensCte SELECT doc_id, word FROM toks WHERE word <> ''",
    "normalize_project" ->
      "SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS norm_text FROM documents",
  )
}

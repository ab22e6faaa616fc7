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
  private[graft] val tokensCte =
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
    // RDD twin of the flagship (BASELINE.json: "RDD API + distributed
    // operations"): textFile-analog -> flatMap -> reduceByKey, surfaced
    // back as a DataFrame for the oracle gate
    "wordcount_rdd" -> ((s, d) => {
      val rdd = TextPipeline.wordCountRdd(s, Tables.documents(s, d))
      s.createDataFrame(rdd).toDF("word", "cnt")
    }),
    // tokenizer with positions (posexplode — ordinal-preserving UDTF analog)
    "tokenize_pos" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(trim(TextPipeline.normalize(col("text"))), "\\s+")))
        .toDF("doc_id", "pos", "word")
        .filter(col("word") =!= "")
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("word"))),
    // Heavy hitters via the approx_top_k frequent-items sketch (Spark 4)
    // with the same oracle-gate design as agg_approx_distinct: the verified
    // columns are the EXACT top-5 (count DESC, word ASC), plus a boolean
    // asserting each exact heavy hitter appears in the sketch's top-5 item
    // set. The sketch is the 100 TB path — fixed memory, one merge pass —
    // and is EXACT whenever distinct items fit its tracking capacity (no
    // eviction), so the gate is deterministic on the fixture vocabulary.
    "heavy_hitters" -> ((s, d) => {
      val toks = TextPipeline.tokenize(Tables.documents(s, d))
      val exactTop = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(5)
      val sketch = toks.agg(expr("approx_top_k(word, 5)").as("topk"))
      exactTop.crossJoin(broadcast(sketch))
        .select(col("word"), col("cnt"),
          array_contains(expr("transform(topk, x -> x.item)"), col("word"))
            .as("in_sketch_top5"))
    }),
    // word-bigram frequency table: the n-gram analog of wordcount, all
    // map-side until the single count aggregate
    "ngram_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(trim(TextPipeline.normalize(col("text"))), "\\s+").as("words"))
        .filter(size(col("words")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(words) - 2), i -> array_join(slice(words, i + 1, 2), ' '))"))
          .as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))),
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
    "wordcount_rdd" ->
      s"$tokensCte SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word",
    "tokenize_pos" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')), '\s+') AS words
        |  FROM documents),
        |p AS (SELECT doc_id, words, unnest(generate_series(1, len(words))) AS pos FROM w)
        |SELECT doc_id, pos::BIGINT AS pos, words[pos] AS word
        |FROM p WHERE words[pos] <> ''""".stripMargin,
    "heavy_hitters" ->
      s"""$tokensCte SELECT word, count(*) AS cnt, true AS in_sketch_top5
        |FROM toks WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 5""".stripMargin,
    "ngram_counts" ->
      """WITH w AS (
        |  SELECT string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')), '\s+') AS words
        |  FROM documents),
        |pos AS (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i
        |        FROM w WHERE len(words) >= 2)
        |SELECT array_to_string(words[i:i+1], ' ') AS ngram, count(*) AS cnt
        |FROM pos GROUP BY 1""".stripMargin,
  )
}

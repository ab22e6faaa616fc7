package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextPipeline
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline: token counting
  * (whitespace + BPE-ish regex), quality scoring, heuristic language ID,
  * and content fingerprinting.
  *
  * Everything is built from codegen'd `functions._` + higher-order array
  * functions (`transform`/`filter`/`aggregate`) — no UDFs, so every operator
  * stays inside whole-stage codegen and is embarrassingly parallel: at
  * 100 TB these are pure map-side projections with zero shuffle.
  */
object TextAnalysis {

  /** BPE-ish pre-tokenization pattern: letter runs, digit runs, or single
    * non-space symbols (a public approximation of GPT-2-style pre-split).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace tokens, BPE-ish tokens, char count, avg token length. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_calc"),
      round(
        expr("aggregate(transform(split(trim(text), '\\\\s+'), w -> length(w)), 0L, (acc, x) -> acc + x)")
          / size(toks(col("text"))), 4).as("avg_token_len"))

  /** Quality signals: stopword ratio, digit ratio, symbol ratio, mean word
    * length — combined into a bounded [0,1] score. Heuristics follow the
    * public C4/Gopher-style quality-filter recipes (length + stopword +
    * symbol checks), simplified to be exactly SQL-mirrorable.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nToks = size(toks(col("text"))).cast("double")
    val stopHits =
      expr("size(filter(split(trim(text), '\\\\s+'), w -> w IN ('the', 'a', 'of', 'and', 'to')))").cast("double")
    val digits = (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("double")
    val symbols = (length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))).cast("double")
    val chars = length(col("text")).cast("double")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      round(stopHits / nToks, 4).as("stopword_ratio"),
      round(digits / chars, 4).as("digit_ratio"),
      round(symbols / chars, 4).as("symbol_ratio"),
      round(
        least(lit(1.0),
          lit(0.5) * least(lit(1.0), nToks / lit(50.0))
            + lit(0.3) * least(lit(1.0), stopHits / nToks * lit(10.0))
            + lit(0.2) * (lit(1.0) - symbols / chars)), 4).as("quality_score"))
  }

  /** Heuristic language ID: stopword-marker voting (n-gram-free variant of
    * the classic stopword-profile method). Deterministic CASE cascade so the
    * oracle mirrors it exactly; falls back to 'en'.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    def hits(words: Seq[String]): Column =
      expr(s"size(filter(split(trim(lower(text)), '\\\\s+'), w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))")
    val es = hits(Seq("el", "la", "los", "de", "que", "y"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "les", "des", "est", "et"))
    val en = hits(Seq("the", "a", "of", "and", "to", "is"))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang").as("lang_actual"),
      when(es > de && es > fr && es > en, "es")
        .when(de > fr && de > en, "de")
        .when(fr > en, "fr")
        .otherwise("en").as("lang_pred"))
  }

  /** Content fingerprint: md5 over normalized text (hex + a 60-bit integer
    * form for compact joins). The md5 primitive is shared with DuckDB, so
    * fingerprints are cross-engine stable — this is the join key for exact
    * dedup at any scale.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = TextPipeline.normalize(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(norm).as("fp"),
      conv(substring(md5(norm), 1, 15), 16, 10).cast("long").as("fp60"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_counts" -> tokenCounts _,
    "text_quality" -> qualityScore _,
    "text_langid" -> langId _,
    "doc_fingerprint" -> fingerprint _,
  )

  def oracle: Map[String, String] = Map(
    "text_token_counts" ->
      """WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS words FROM documents)
        |SELECT doc_id, len(words)::BIGINT AS n_ws_tokens,
        | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_bpe_tokens,
        | length(text)::BIGINT AS n_chars_calc,
        | round(list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words), 4) AS avg_token_len
        |FROM w""".stripMargin,
    "text_quality" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |   len(string_split_regex(trim(text), '\s+')) * 1.0 AS n_toks,
        |   len(list_filter(string_split_regex(trim(text), '\s+'),
        |       w -> w IN ('the', 'a', 'of', 'and', 'to'))) * 1.0 AS stop_hits,
        |   (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 AS digits,
        |   (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0 AS symbols,
        |   length(text) * 1.0 AS chars
        |  FROM documents)
        |SELECT doc_id,
        | round(stop_hits / n_toks, 4) AS stopword_ratio,
        | round(digits / chars, 4) AS digit_ratio,
        | round(symbols / chars, 4) AS symbol_ratio,
        | round(least(1.0,
        |   0.5 * least(1.0, n_toks / 50.0)
        |   + 0.3 * least(1.0, stop_hits / n_toks * 10.0)
        |   + 0.2 * (1.0 - symbols / chars)), 4) AS quality_score
        |FROM w""".stripMargin,
    "text_langid" ->
      """WITH w AS (
        |  SELECT doc_id, lang AS lang_actual,
        |   string_split_regex(trim(lower(text)), '\s+') AS words FROM documents),
        |h AS (
        |  SELECT doc_id, lang_actual,
        |   len(list_filter(words, w -> w IN ('el','la','los','de','que','y'))) AS es,
        |   len(list_filter(words, w -> w IN ('der','die','das','und','ist'))) AS de,
        |   len(list_filter(words, w -> w IN ('le','les','des','est','et'))) AS fr,
        |   len(list_filter(words, w -> w IN ('the','a','of','and','to','is'))) AS en
        |  FROM w)
        |SELECT doc_id, lang_actual,
        | CASE WHEN es > de AND es > fr AND es > en THEN 'es'
        |      WHEN de > fr AND de > en THEN 'de'
        |      WHEN fr > en THEN 'fr'
        |      ELSE 'en' END AS lang_pred
        |FROM h""".stripMargin,
    "doc_fingerprint" ->
      """WITH n AS (SELECT doc_id,
        |  lower(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS norm FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        | ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp60
        |FROM n""".stripMargin,
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.rdd.RDD

/** The reference's entire query surface, Spark-first.
  *
  * Reference pipeline (SURVEY.md §2.1 ops 1-9): HDFS text scan → scalar
  * normalize (`greeter_client.cc:316-321`) → static 4-way line split →
  * tokenize (`greeter_server.cc:72-79`) → map-side partial hash agg
  * (`greeter_server.cc:78`) → intermediate text files → single-reducer merge
  * (`greeter_server.cc:92-110`) → HDFS sink → interactive top-N
  * (`greeter_server.cc:50-64`).
  *
  * Here the whole thing is one declarative plan:
  * `Scan → Project(normalize) → Generate(explode) → HashAggregate(partial)
  *  → Exchange(hashpartitioning(word)) → HashAggregate(final)` —
  * Catalyst inserts the partial/final aggregate split (the reference's
  * hand-written combiner) automatically, the shuffle replaces the
  * local-text-file "shuffle", and whole-stage codegen fuses
  * normalize+tokenize+partial-agg into one generated loop. Scale posture:
  * no driver-side materialization anywhere (the reference buffers the whole
  * corpus in one master string, `greeter_client.cc:309-313`); every stage
  * streams per-partition and the only barrier is the word-hash exchange,
  * whose width follows `spark.sql.shuffle.partitions` / AQE.
  */
object TextPipeline {

  /** Scalar normalize, exact reference semantics (`greeter_client.cc:316-321`):
    * punctuation DELETED (not blanked, so "don't" → "dont"), lowercase,
    * digits kept, whitespace preserved.
    */
  def normalize(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))

  /** Whitespace tokenization (`greeter_server.cc:72-79`). `trim` + the
    * empty-string filter in callers reproduce C++ `operator>>`, which can
    * never emit an empty token where Spark's `split` can.
    */
  def tokens(c: Column): Column =
    split(trim(normalize(c)), "\\s+")

  /** One row per (doc, token). */
  def tokenize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")

  /** The flagship: GROUP BY word COUNT(*) — ops 4+5+7 in one plan. */
  def wordCount(docs: DataFrame): DataFrame =
    tokenize(docs).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Top-N view (`greeter_server.cc:50-64`) with a deterministic total order
    * (count DESC, word ASC) — the reference's sort leaves ties unspecified.
    * Catalyst plans this as `TakeOrderedAndProjectExec`: a bounded per-
    * partition heap + driver merge, NOT a full sort — exactly the bounded
    * top-K the reference's full `std::sort` should have been.
    */
  def topN(wordCounts: DataFrame, n: Int): DataFrame =
    wordCounts.orderBy(col("cnt").desc, col("word").asc).limit(n)

  /** RDD twin of the flagship — the honest analog of the reference's
    * map/combine/reduce split (`BASELINE.json: spark_approach`):
    * `flatMap` = Mapper tokenize loop, `reduceByKey` = map-side combine
    * (`greeter_server.cc:78`) + shuffle + reduce merge
    * (`greeter_server.cc:105-110`). Used to cross-check the DataFrame plan.
    */
  def wordCountRdd(spark: SparkSession, docs: DataFrame): RDD[(String, Long)] = {
    docs.select(col("text")).rdd
      .flatMap { row =>
        val text = row.getString(0)
        val norm = text.toLowerCase.filter(ch => ch.isLetterOrDigit || ch.isWhitespace)
        norm.split("\\s+").filter(_.nonEmpty)
      }
      .map((_, 1L))
      .reduceByKey(_ + _)
  }

  /** Reference sink (`greeter_server.cc:115-121`): overwrite text sink of
    * `word count` lines. Distributed write, one file per partition.
    */
  def writeWordCounts(wc: DataFrame, path: String): Unit =
    wc.select(concat_ws(" ", col("word"), col("cnt")))
      .write.mode("overwrite").text(path)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline
import graft.sources.Tables

class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("normalize deletes punctuation (not blanked), lowercases, keeps digits") {
    val out = df(Seq((1L, "Don't co/xyz A-B 10,000!")))
      .select(TextPipeline.normalize($"text")).as[String].head()
    // reference semantics greeter_client.cc:316-321: punctuation removed
    assert(out == "dont coxyz ab 10000")
  }

  test("tokenize never emits empty tokens (C++ operator>> parity)") {
    val words = TextPipeline.tokenize(df(Seq((1L, "  hello   world  "), (2L, "!!!"), (3L, ""))))
      .select("word").as[String].collect().toSeq
    assert(words.sorted == Seq("hello", "world"))
  }

  test("wordCount on a hand-computed corpus") {
    val wc = TextPipeline.wordCount(df(Seq((1L, "a b a"), (2L, "b c... c! C"))))
      .as[(String, Long)].collect().toMap
    assert(wc == Map("a" -> 2L, "b" -> 2L, "c" -> 3L))
  }

  test("topN is deterministic under ties: count DESC then word ASC") {
    val top = TextPipeline.topN(
      TextPipeline.wordCount(df(Seq((1L, "b a c b a z z")))), 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 2L), ("b", 2L), ("z", 2L)))
  }

  test("sum of word counts equals total token count (mass conservation)") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val totalTokens = TextPipeline.tokenize(docs).count()
    val sumCounts = TextPipeline.wordCount(docs).agg(sum("cnt")).as[Long].head()
    assert(totalTokens == sumCounts)
  }

  test("wordCount is partition-count invariant (the reference's global-counts bug violated this)") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val base = TextPipeline.wordCount(docs).as[(String, Long)].collect().toMap
    val rep = TextPipeline.wordCount(docs.repartition(7)).as[(String, Long)].collect().toMap
    assert(base == rep)
  }

  test("RDD twin agrees with the DataFrame plan") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dfCounts = TextPipeline.wordCount(docs).as[(String, Long)].collect().toMap
    val rddCounts = TextPipeline.wordCountRdd(spark, docs).collect().toMap
    assert(dfCounts == rddCounts)
  }

  test("RDD takeOrdered agrees with topN under the same total order") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val viaDf = TextPipeline.topN(TextPipeline.wordCount(docs), 10)
      .as[(String, Long)].collect().toSeq
    val viaRdd = TextPipeline.wordCountRdd(spark, docs)
      .takeOrdered(10)(Ordering.by { case (w, c) => (-c, w) }).toSeq
    assert(viaDf == viaRdd)
  }

  test("normalization is idempotent") {
    val docs = Tables.documents(spark, TestSpark.sf).select($"text")
    val once = docs.select(TextPipeline.normalize($"text").as("t"))
    val twice = once.select(TextPipeline.normalize($"t").as("t"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("decontamination flags planted benchmark overlap, spares clean docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // benchmark
      // contaminated: contains the 5-gram "quick brown fox jumps over"
      (10L, "she said quick brown fox jumps over and left"),
      // clean: same words, different order — no shared 5-gram
      (11L, "fox brown quick the jumps dog lazy the over again"),
      (12L, "completely unrelated text with many plain words here")
    ).toDF("doc_id", "text")
    val flagged = graft.functions.TextAnalysis
      .decontaminateOn(docs, col("doc_id") < 10)
      .as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(10L), s"flagged: $flagged")
    assert(flagged(10L) >= 1L)
  }

  test("shard packing: per-stratum shard ids start at 0 and never decrease") {
    val shards = graft.functions.TextAnalysis.shardPacking(spark, TestSpark.sf)
      .orderBy("lang", "doc_id")
      .as[(Long, String, Long)].collect()
    assert(shards.nonEmpty)
    shards.groupBy(_._2).foreach { case (lang, rows) =>
      val ids = rows.sortBy(_._1).map(_._3)
      assert(ids.head == 0L, s"$lang first shard ${ids.head}")
      assert(ids.zip(ids.tail).forall { case (a, b) => b >= a && b <= a + 1 },
        s"$lang shard ids must be non-decreasing without gaps")
    }
  }
}

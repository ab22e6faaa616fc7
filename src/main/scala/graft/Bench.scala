package graft

/** Benchmark main: times the HEADLINE query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (`BENCH_r{N}.json`).
  *
  * Headline = the flagship plus one representative per operator family
  * (full list below) — the correctness gate (`graft.Verify`) still runs
  * every registered query. Set `SPARK_GRAFT_BENCH_ALL=1` to time the whole
  * registry instead.
  *
  * A warmup action runs first so session bring-up / codegen JIT is not
  * charged to the first query; each timed run drains the full plan with
  * `count()` (scan → transforms → action, no driver materialization); the
  * cache is cleared between queries so storage from one query cannot evict
  * or GC-thrash the next.
  */
object Bench {

  /** Flagship + one per family (text core, relational join/agg/window,
    * events, dedup, similarity, text analysis, custom operator).
    */
  val headline: Seq[String] = Seq(
    "wordcount", "wordcount_topn", "q1_pricing_summary", "join_shuffle",
    "join_broadcast", "window_rank", "events_tumbling", "sessionize",
    "dedup_exact", "dedup_minhash_lsh", "knn_bruteforce", "knn_lsh",
    "text_quality", "topk_per_group", "pipeline_clean_corpus",
    "q5_supplier_volume", "multimodal_features")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every fixture table so file listing + footer reads and
    // JIT warm paths are excluded from timings
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // JIT/codegen warm pass over the flagship plan shape (sf0.001-sized)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) => only.split(",").toSeq.filter(SparkEntry.queries.contains)
      case None =>
        if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
          SparkEntry.queries.keys.toSeq.sorted
        else headline.filter(SparkEntry.queries.contains)
    }
    val tracker = spark.sparkContext.statusTracker
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // job group → post-hoc job/stage/task counts: every Spark JOB is a
      // scheduling barrier (and on a contended cluster each costs real
      // wall-clock), so barrier-count regressions matter as much as seconds
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val jobIds = tracker.getJobIdsForGroup(name)
      val stageIds = jobIds.flatMap(j => tracker.getJobInfo(j).map(_.stageIds.toSeq).getOrElse(Nil))
      val nTasks = stageIds.distinct.flatMap(s => tracker.getStageInfo(s).map(_.numTasks)).sum
      spark.catalog.clearCache()
      (name, dt, jobIds.length, stageIds.distinct.length, nTasks)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, _, j, s, t) =>
      s""""$k":{"jobs":$j,"stages":$s,"tasks":$t}""" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"detail":$detail,"sf":"$sfDir","n_queries_timed":${results.size},"n_queries_registered":${SparkEntry.queries.size}}""")
    spark.stop()
  }
}

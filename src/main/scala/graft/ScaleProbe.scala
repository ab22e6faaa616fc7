package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× SCALE PROBE (diagnostic artifact generator, like [[Explain]] — not
  * part of the query registry).
  *
  * Every scale claim in SURVEY.md is plan-shape reasoning validated at
  * sf0.1; this main validates it EMPIRICALLY: synthesize an sf1-shaped
  * dataset (10× sf0.1 rows), time each probed query at both scales, and
  * report per-query wall-time ratios. A linear operator lands ≈10× (minus
  * fixed costs, plus AQE/scheduling overhead); an accidental O(n²)
  * candidate set — invisible at fixture scale — lands ≫10× and fails the
  * probe's threshold loudly.
  *
  * Round 9 widens the probe from the 17 headliners to 45 queries,
  * deliberately covering the shapes most likely to hide super-linearity:
  * - ITERATIVE FIXPOINTS (`dedup_clusters`, `graph_bfs_levels`,
  *   `doc_pagerank`, `graph_communities`, `graph_khop`): rounds-to-
  *   convergence can grow with data, and per-round cost compounds;
  * - DATA-DEPENDENT CANDIDATE GENERATORS (`dedup_setsim_prefix`'s
  *   prefix-filter pair volume, `dedup_lsh_recall`'s band buckets,
  *   `interval_overlap_join`'s bucket fan-out, `geo_distance_join`'s
  *   cell neighborhoods): the candidate set, not the input, is the real
  *   scaling variable;
  * - the TOP of the full sweep by absolute cost (streaming stateful runs,
  *   `profile_table`, `dedup_consensus`, PQ/IVF training, the corpus
  *   funnel, batched BPE, PMI, association rules) — where a hidden
  *   blowup costs the most wall-clock.
  *
  * sf1 synthesis = 10 key-shifted copies of each sf0.1 table, written as
  * ONE parquet file per table to mirror the fixture layout (the streaming
  * probes symlink `$dir/events.parquet` as a single file, and equal file
  * counts keep micro-batch schedules comparable across scales):
  * - every BIGINT surrogate key shifts by `copy * 100M`, CONSISTENTLY
  *   across tables (copy i of lineitem joins copy i of orders/part/
  *   supplier), so join/agg selectivities match a real 10× corpus;
  * - `region`/`nation` stay fixed (TPC-H dimension-scaling convention);
  * - document TEXT is alphabet-rotated per copy (`translate`, copy 0
  *   identity) so CONTENT cardinality scales 10× too — naive text
  *   duplication would hand the minhash-LSH join 10-member duplicate
  *   clusters (100× in-bucket candidate pairs), a quadratic artifact of
  *   the synthesis rather than the operator;
  * - `events.user_id` shifts per copy: 10× users at the same per-user
  *   event density, the shape a real stream scales with;
  * - embeddings keep their float arrays (vec_id shifts): 10× corpus at
  *   the same geometry, so banded/celled candidate volume scales with
  *   rows, not with synthesis artifacts.
  *
  * Usage: `runMain graft.ScaleProbe [sf01Dir] [sf1Dir] [outJson]`.
  * Emits one JSON line (and writes it to outJson) with per-query
  * {sf01_sec, sf1_sec, ratio} at best-of-2 per scale.
  */
object ScaleProbe {
  private val Stride = 100000000L

  /** BIGINT key columns to shift per copy, per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Probed beyond [[Bench.headline]]: fixpoints, data-dependent candidate
    * generators, and the top of the full sweep by cost.
    */
  val extras: Seq[String] = Seq(
    // iterative fixpoints — per-round cost × data-dependent round count
    "dedup_clusters", "graph_bfs_levels", "doc_pagerank",
    "graph_communities", "graph_khop",
    // data-dependent candidate generators
    "dedup_setsim_prefix", "dedup_lsh_recall",
    "interval_overlap_join", "geo_distance_join", "geo_nearest_summary",
    // top of the full sweep by absolute cost
    "streaming_full_outer", "streaming_outer_join",
    "streaming_tws_timers", "streaming_restart_stateful",
    "knn_ivf_pq", "knn_pq_adc", "embedding_pq",
    "profile_table", "profile_table_approx",
    "dedup_consensus", "dedup_incremental",
    "training_corpus_funnel", "bpe_merges_batched",
    "pmi_ratio", "assoc_rules",
    "join_dpp", "join_bucketed_colocated", "sequence_packing")

  private def rotated(i: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    a.drop(i) + a.take(i)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Write `df` as ONE parquet FILE at `dest` (fixture layout). */
  private def writeSingleFile(df: DataFrame, dest: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val ls = java.nio.file.Files.list(tmp)
      try ls.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    // a pre-V2 probe run left $dest as a parquet DIRECTORY —
    // move(REPLACE_EXISTING) cannot replace a non-empty dir, so clear it
    deleteRecursively(dest)
    java.nio.file.Files.move(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tmp)
  }

  def synthesize(spark: SparkSession, sf01: String, sf1: String): Unit = {
    val done = java.nio.file.Paths.get(sf1, "_PROBE_READY_V2")
    if (java.nio.file.Files.exists(done)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sf1))
    // a pre-V2 marker means every table in this dir is stale — drop it so
    // a half-upgraded dir can't mix generations
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(sf1, "_PROBE_READY"))
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$sf01/$t.parquet")
      val out =
        if (keys.isEmpty) base
        else (0 until 10).map { i =>
          val shifted = keys.foldLeft(base)((df, k) =>
            df.withColumn(k, col(k) + lit(i * Stride)))
          val salted =
            if (t == "documents" && i > 0)
              shifted.withColumn("text",
                translate(col("text"), rotated(0), rotated(i)))
            else shifted
          salted
        }.reduce(_ unionAll _)
      writeSingleFile(out, java.nio.file.Paths.get(sf1, s"$t.parquet"))
      System.err.println(s"[probe] synthesized $t")
    }
    java.nio.file.Files.createFile(done)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/graft-sf1")
    val outJson = args.lift(2).getOrElse("BENCH_SF1_r09.json")
    val spark = Sessions.local("graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, sf01, sf1)

    def timeOnce(fn: (SparkSession, String) => DataFrame, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      (dt, n)
    }
    // best-of-2 per scale drops one contended sample — but a >60 s run is
    // contention-insensitive and not worth paying twice
    def timeBest(fn: (SparkSession, String) => DataFrame, dir: String): (Double, Long) = {
      val (t1, n) = timeOnce(fn, dir)
      if (t1 > 60.0) (t1, n) else (math.min(t1, timeOnce(fn, dir)._1), n)
    }
    // warm the JIT + file listings once off the clock
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val probed = (Bench.headline ++ extras).distinct.filter(SparkEntry.queries.contains)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    case class Row(name: String, t01: Double, t1: Double, ratio: Double,
        n01: Long, n1: Long) {
      // OUTPUT growth: operators whose result cardinality itself scales
      // super-linearly (a radius join under 10× density produces ~100×
      // pairs BY CONSTRUCTION) are judged on time-per-output-row, the
      // only metric an output-bound operator can be held to
      def rowsRatio: Double = if (n01 > 0) n1.toDouble / n01 else 1.0
      def perRowRatio: Double = ratio / math.max(1.0, rowsRatio)
    }
    val rows = probed.flatMap { name =>
      val fn = SparkEntry.queries(name)
      try {
        val (a, n01) = timeBest(fn, sf01)
        val (b, n1) = timeBest(fn, sf1)
        val ratio = if (a > 0) b / a else -1.0
        val r = Row(name, a, b, ratio, n01, n1)
        System.err.println(f"[probe] $name%-28s sf0.1=$a%7.2fs  sf1=$b%7.2fs  " +
          f"ratio=$ratio%6.2f  rows=${r.rowsRatio}%6.2fx  per-row=${r.perRowRatio}%5.2f")
        Some(r)
      } catch {
        case t: Throwable =>
          errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
          System.err.println(s"[probe] $name FAILED: ${errors(name)}")
          None
      }
    }
    val qs = rows.map { r =>
      f""""${r.name}":{"sf01_sec":${r.t01}%.3f,"sf1_sec":${r.t1}%.3f,"ratio":${r.ratio}%.2f,"rows_sf01":${r.n01},"rows_sf1":${r.n1},"rows_ratio":${r.rowsRatio}%.2f,"per_row_ratio":${r.perRowRatio}%.2f}"""
    }.mkString("{", ",", "}")
    val errStr = errors.map { case (n, m) =>
      s""""$n":"${m.replace("\\", "\\\\").replace("\"", "'").replace("\n", " ")}""""
    }.mkString("{", ",", "}")
    // all-failed runs must still emit the JSON (it carries the error
    // details needed to diagnose them) — worst_* fields go null
    val worstFields =
      if (rows.isEmpty) """"worst_ratio":null,"worst_query":null,"worst_per_row_ratio":null,"worst_per_row_query":null"""
      else {
        val worst = rows.maxBy(_.ratio)
        val worstPerRow = rows.maxBy(_.perRowRatio)
        f""""worst_ratio":${worst.ratio}%.2f,"worst_query":"${worst.name}","worst_per_row_ratio":${worstPerRow.perRowRatio}%.2f,"worst_per_row_query":"${worstPerRow.name}""""
      }
    val json =
      f"""{"metric":"sf1_scale_probe","rows_multiplier":10,"n_queries":${rows.size},"queries":$qs,"errors":$errStr,$worstFields,"sf01_total":${rows.map(_.t01).sum}%.2f,"sf1_total":${rows.map(_.t1).sum}%.2f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

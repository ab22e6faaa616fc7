package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10× SCALE PROBE for the headline suite (diagnostic artifact
  * generator, like [[Explain]] — not part of the query registry).
  *
  * Every scale claim in SURVEY.md is plan-shape reasoning validated at
  * sf0.1; this main validates it EMPIRICALLY: synthesize an sf1-shaped
  * dataset (10× sf0.1 rows), time each headline query at both scales, and
  * report per-query wall-time ratios. A linear operator lands ≈10× (minus
  * fixed costs, plus AQE/scheduling overhead); an accidental O(n²)
  * candidate set — invisible at fixture scale — lands ≫10× and fails the
  * probe's threshold loudly.
  *
  * sf1 synthesis = 10 key-shifted copies of each sf0.1 table:
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
  *   event density, the shape a real stream scales with.
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

  private def rotated(i: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    a.drop(i) + a.take(i)
  }

  def synthesize(spark: SparkSession, sf01: String, sf1: String): Unit = {
    val done = java.nio.file.Paths.get(sf1, "_PROBE_READY")
    if (java.nio.file.Files.exists(done)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sf1))
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
      out.write.mode("overwrite").parquet(s"$sf1/$t.parquet")
      System.err.println(s"[probe] synthesized $t")
    }
    java.nio.file.Files.createFile(done)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("/tmp/graft-sf1")
    val outJson = args.lift(2).getOrElse("BENCH_SF1_r08.json")
    val spark = Sessions.local("graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, sf01, sf1)

    def timeOnce(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      dt
    }
    // warm the JIT + file listings once off the clock
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val rows = Bench.headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      // best-of-2 per scale: drops one contended sample without the cost
      // of full median-of-3 at sf1
      val a = math.min(timeOnce(fn, sf01), timeOnce(fn, sf01))
      val b = math.min(timeOnce(fn, sf1), timeOnce(fn, sf1))
      val ratio = if (a > 0) b / a else -1.0
      System.err.println(f"[probe] $name%-24s sf0.1=$a%7.2fs  sf1=$b%7.2fs  ratio=$ratio%6.2f")
      (name, a, b, ratio)
    }
    val qs = rows.map { case (n, a, b, r) =>
      f""""$n":{"sf01_sec":$a%.3f,"sf1_sec":$b%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val worst = rows.maxBy(_._4)
    val json =
      f"""{"metric":"sf1_scale_probe","rows_multiplier":10,"queries":$qs,"worst_ratio":${worst._4}%.2f,"worst_query":"${worst._1}","sf01_total":${rows.map(_._2).sum}%.2f,"sf1_total":${rows.map(_._3).sum}%.2f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining

class MiningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("skipgram pairs: window ±2 endpoints, both directions, from 'a b c'") {
    val out = Mining.skipgramPairsOn(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 1L), ("b", "a", 1L),   // distance 1
      ("b", "c", 1L), ("c", "b", 1L),   // distance 1
      ("a", "c", 1L), ("c", "a", 1L)))  // distance 2
  }

  test("skipgram pairs are symmetric: cnt(x,y) == cnt(y,x)") {
    val rows = Mining.skipgramPairsOn(
      Seq((1L, "the cat sat on the mat"), (2L, "the cat ran")).toDF("doc_id", "text"))
      .as[(String, String, Long)].collect()
    val m = rows.map { case (c, x, n) => (c, x) -> n }.toMap
    rows.foreach { case (c, x, n) => assert(m((x, c)) == n, s"asymmetric at ($c,$x)") }
  }

  test("pmi ratio: single-doc 'a b' gives pc*Nu^2/(Np*ca*cb) = 4.0") {
    val out = Mining.pmiRatioOn(Seq((1L, "a b")).toDF("doc_id", "text"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 4.0)))
  }

  test("feature hashing: buckets within [0,64), counts sum to token count") {
    val docs = Seq((1L, "x y z x"), (2L, "q")).toDF("doc_id", "text")
    val out = Mining.featureHashingOn(docs).as[(Long, Long, Long)].collect()
    assert(out.forall { case (_, b, _) => b >= 0 && b < 64 })
    assert(out.map(_._3).sum == 5)
    // same word -> same bucket on every run (pure content hash)
    val again = Mining.featureHashingOn(docs).as[(Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("vocab coverage: word 21 of a 21-word uniform corpus is OOV") {
    // all counts tie at 1 -> top-20 vocabulary is lexicographic w01..w20
    val text = (1 to 21).map(i => f"w$i%02d").mkString(" ")
    val out = Mining.vocabCoverageOn(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 21L, 1L, 1.0 / 21)))
  }

  test("event pattern match: click→purchase without error between") {
    val events = Seq(
      (1L, ts(10), 1L, "click"), (2L, ts(20), 1L, "view"), (3L, ts(30), 1L, "purchase"),
      (4L, ts(10), 2L, "click"), (5L, ts(20), 2L, "error"), (6L, ts(30), 2L, "purchase"),
      (7L, ts(10), 3L, "purchase"), (8L, ts(20), 3L, "click"),
      (9L, ts(10), 4L, "click"), (10L, ts(20), 4L, "purchase"), (11L, ts(30), 4L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Mining.eventPatternMatchOn(events)
      .select("user_id", "seq", "matched").as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("cvp", true))
    assert(out(2L) == ("cep", false))   // error between
    assert(out(3L) == ("pc", false))    // wrong order
    assert(out(4L) == ("cpe", true))    // error after the match is fine
  }

  test("interval overlap: binned equi-join == closed-interval hour overlap") {
    val events = Seq(
      // user 1: two errors in hour 0 -> incident hour 0, session [300, 360]
      (1L, ts(300), 1L, "error"), (2L, ts(360), 1L, "error"),
      // user 2: one session [3000, 4200] spanning hours 0 and 1
      (3L, ts(3000), 2L, "click"), (4L, ts(4200), 2L, "view"),
      // user 3: session entirely in hour 1 (no incident there) -> no match
      (5L, ts(4000), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Mining.intervalOverlapJoinOn(events)
      .select("user_id", "hr_epoch", "n_errors").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 2L), (2L, 0L, 2L)))
  }

  test("profile_table: nulls, distincts, min/max per column, crafted frame") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("c")))
      .toDF("id", "tag")
    val out = Mining.profileTableOn(df, Seq("id", "tag"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("id") == ((1L, 2L, "1", "2")))
    assert(out("tag") == ((1L, 2L, "a", "c")))
  }

  test("table_checksum: order-independent, duplicate-sensitive") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (1L, "x")).toDF("k", "v")       // permuted
    val c = Seq((1L, "x"), (1L, "x")).toDF("k", "v")       // dup multiset
    def sum(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      Mining.tableChecksumOn(df, Seq("k", "v")).as[(Long, Long)].head()
    assert(sum(a) == sum(b))
    assert(sum(a) != sum(c) && sum(c)._1 == 2L)
  }

  test("weighted sample: 100 rows, priorities ascending, heavy rows favored") {
    val out = Mining.weightedSample(spark, TestSpark.sf)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 100)
    assert(out.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    // the selected rows' mean weight should exceed the table mean —
    // that's the entire point of weighting the priorities
    val tableMean = graft.sources.Tables.orders(spark, TestSpark.sf)
      .agg(avg("o_totalprice")).as[Double].head()
    val sampleMean = out.map(_._2).sum / out.length
    assert(sampleMean > tableMean, s"sample $sampleMean !> table $tableMean")
  }

  test("join_cardinality_est: estimate equals the actual inner-join size") {
    val est = Mining.joinCardinalityEst(spark, TestSpark.sf)
      .as[(Long, Long)].head()
    val actual = graft.sources.Tables.orders(spark, TestSpark.sf)
      .join(graft.sources.Tables.lineitem(spark, TestSpark.sf),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(est._2 == actual)
  }

  test("chi-square: expected counts sum back to N within each row margin") {
    val out = Mining.statChiSquare(spark, TestSpark.sf)
      .as[(Int, String, Long, Double, Double)].collect()
    assert(out.forall(_._5 >= 0.0))
    // Σ expected over a nation's cells == that nation's row total == Σ observed
    val byNation = out.groupBy(_._1)
    byNation.values.foreach { cells =>
      val exp = cells.map(_._4).sum
      val obs = cells.map(_._3).sum.toDouble
      assert(math.abs(exp - obs) < 1e-6, s"margin mismatch: $exp vs $obs")
    }
  }

  test("winsorize: clamp counts bounded by the 5% tails") {
    val out = Mining.winsorize(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, lo, hi, p05, p95) =>
      assert(p05 <= p95)
      // strict-inequality clamping touches at most ~5% per tail
      assert(lo <= math.ceil(n * 0.05).toLong, s"lo=$lo n=$n")
      assert(hi <= math.ceil(n * 0.05).toLong, s"hi=$hi n=$n")
    }
  }

  test("revenue shares are positive and sum to 1") {
    val shares = Mining.revenueShare(spark, TestSpark.sf)
      .select("share").as[Double].collect()
    assert(shares.forall(_ > 0))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("keyset pagination: strictly after the boundary, sorted, bounded") {
    val rows = Mining.keysetPagination(spark, TestSpark.sf)
      .as[(Long, Double, String)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 50)
    assert(rows.forall { case (k, p, _) => p > 250000.0 || (p == 250000.0 && k > 0) })
    assert(rows == rows.sortBy(r => (r._2, r._1)))
  }

  test("embedding dim stats: every dimension profiles the whole corpus") {
    val n = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    val out = Mining.embeddingDimStats(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 64)
    out.foreach { case (_, cnt, sum, mn, mx, mean) =>
      assert(cnt == n)
      assert(mn <= mx && mean >= mn && mean <= mx)
      assert(mean == sum.toDouble / cnt)
    }
  }

  test("incremental agg merge equals the one-shot aggregate") {
    val merged = Mining.incrementalAggMerge(spark, TestSpark.sf)
      .orderBy("o_orderstatus").collect().toSeq
    val full = graft.sources.Tables.orders(spark, TestSpark.sf)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"),
        min("o_orderdate").as("first_date"), max("o_orderdate").as("last_date"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(merged == full)
  }

  test("k-anonymity flags exactly the groups under k=5 on the fixture") {
    val out = Mining.kAnonymity(spark, TestSpark.sf)
      .select("group_size", "k_anonymous").as[(Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, ok) => assert(ok == (n >= 5)) }
  }

  test("dq_expectations: one row per rule, clean fixture passes, violations bounded by checked") {
    val rows = Mining.dqExpectations(spark, TestSpark.sf)
      .select("rule", "n_checked", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(
      "custkey_references_customer", "orderdate_in_range", "priority_format",
      "status_in_domain", "totalprice_positive"))
    rows.foreach { case (rule, checked, viol, pass) =>
      assert(viol >= 0 && viol <= checked, rule)
      assert(pass == (viol == 0), rule)
    }
    // the fixture is generated clean: every expectation must hold
    assert(rows.forall(_._4), s"fixture should pass all rules: ${rows.mkString(",")}")
  }

  test("dp noisy counts: noise is nonzero, bounded, and deterministic across runs") {
    def run() = Mining.dpNoisyCounts(spark, TestSpark.sf)
      .select("o_orderpriority", "true_count", "noisy_count")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val rows = run()
    assert(rows.map(_._1) == rows.map(_._1).distinct, "one row per group")
    rows.foreach { case (g, n, noisy) =>
      assert(noisy != n.toDouble, s"$g: noise must actually perturb the count")
      // Laplace(b=1/ε) tail: |noise| = b·|ln(1−2|u−½|)| — 60-bit uniforms
      // never land close enough to the edge to exceed ~42·b
      assert(math.abs(noisy - n) < 42.0 / Mining.DpEpsilon, s"$g: |noise| out of tail bound")
    }
    assert(run() == rows, "seeded mechanism must be replayable")
  }

  test("tableDiff on an EMPTY base still reports the synthetic insert as added") {
    val empty = graft.sources.Tables.orders(spark, TestSpark.sf).limit(0)
    val diff = Mining.tableDiffOf(empty)
      .as[(Long, String)].collect().toSeq
    assert(diff == Seq((-1L, "added")),
      s"empty base must yield exactly the synthetic -1/added row, got $diff")
  }
}

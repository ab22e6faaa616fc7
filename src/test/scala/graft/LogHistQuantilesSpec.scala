package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining
import graft.plans.LogHistQuantiles
import graft.sources.Tables

class LogHistQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketOf matches the SQL-replay formula and is monotone with bounded width") {
    import LogHistQuantiles.{bucketOf, SubBuckets}
    // the oracle's general form: e·m + (v − 2^e)·m // 2^e
    def sqlForm(v: Long): Int = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (e * SubBuckets + (v - (1L << e)) * SubBuckets / (1L << e)).toInt
    }
    val probes = (1L to 4096L) ++
      Seq(1L, 2L, 31L, 32L, 33L, 1023L, 1 << 20, (1L << 42) - 1)
    probes.foreach { v =>
      assert(bucketOf(v) == sqlForm(v), s"shift form diverges from SQL form at v=$v")
    }
    // monotone: a larger value never lands in an earlier bucket
    probes.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(bucketOf(a) <= bucketOf(b))
      case _ =>
    }
    // clamps: non-positive → bucket 0; beyond the top octave → last bucket
    assert(bucketOf(0L) == 0 && bucketOf(-5L) == 0)
    assert(bucketOf(Long.MaxValue) == LogHistQuantiles.NumBuckets - 1)
    // width bound: the bucket lower bound is within a 1/m relative band
    Seq(100L, 85771L, 999999L, 12345678L).foreach { v =>
      val idx = bucketOf(v)
      val e = idx / SubBuckets
      val lbX32 = (SubBuckets + idx % SubBuckets).toLong * (1L << e)
      assert(lbX32 <= v * 32 && v * 32 < lbX32 + (1L << e),
        s"v=$v outside its bucket band")
    }
  }

  test("quantile_sketch_merge: estimates within the 1/32 relative band of exact percentiles") {
    val out = Mining.quantileSketchMerge(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(50L, 90L, 99L))
    val cents = Tables.orders(spark, TestSpark.sf)
      .select(round(col("o_totalprice") * 100).cast("long")).as[Long].collect().sorted
    out.foreach { case (q, (_, nRows, _, estX32)) =>
      assert(nRows == cents.length.toLong)
      val exact = cents(((q * cents.length + 99) / 100 - 1).toInt)
      // estimate is the bucket lower bound: ≤ exact < estimate·(1 + 1/32)
      assert(estX32 <= exact * 32 && exact * 32 < estX32 + (estX32 / 32) + 32,
        s"q=$q est_x32=$estX32 exact=$exact outside the sketch error band")
    }
  }

  test("sketch build aggregates through ObjectHashAggregate (sketches cross the shuffle, not rows)") {
    val p = Mining.quantileSketchMerge(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      "loghist_sketch must plan as a TypedImperativeAggregate with partial merge")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("knn excludes self and returns exactly k ranks per query") {
    val knn = Similarity.knnBruteForce(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(knn.forall { case (q, n, _) => q != n })
    val byQuery = knn.groupBy(_._1)
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 10L))
    }
  }

  test("top-1 brute-force neighbor is symmetric-consistent with cosine definition") {
    // rank 1 for query q must have cosine >= rank 2's cosine: implied by
    // row_number ordering; spot-check determinism by running twice
    val a = Similarity.knnBruteForce(spark, TestSpark.sf).as[(Long, Long, Long)].collect().toSet
    val b = Similarity.knnBruteForce(spark, TestSpark.sf).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("LSH bucket neighbors are a subset of the vector universe, self-free") {
    val lsh = Similarity.knnLsh(spark, TestSpark.sf).as[(Long, Long, Long)].collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (q, n, r) => q != n && r >= 1 && r <= 3 })
  }
}

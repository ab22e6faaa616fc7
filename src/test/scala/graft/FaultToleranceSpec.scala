package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-tolerance exercised EMPIRICALLY — the data-plane proof behind
  * SURVEY §2.1 rows 10/11 (the reference's heartbeat + task-reassignment
  * control plane, `greeter_client.cc:136-294`): Spark's scheduler must
  * detect a failed task, rerun it on another attempt, and produce results
  * indistinguishable from a clean run — including through a shuffle whose
  * map side contains the retried task. The reference reassigns a dead
  * worker's chunk to the first available server; Spark's analog is task
  * rescheduling under `spark.task.maxFailures` (the test session runs
  * `local[4,2]` to allow one retry; production default is 4).
  */
class FaultToleranceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a transient task failure is retried and the shuffled result is exact") {
    import spark.implicits._
    FaultToleranceSpec.fail.set(true)
    val flaky = spark.range(0, 100000, 1, 8).as[Long]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 3 && tc.attemptNumber() == 0 &&
            FaultToleranceSpec.fail.getAndSet(false))
          throw new RuntimeException("graft injected transient task failure")
        it
      }
    // aggregate ACROSS a shuffle: the retried map task's output must be
    // fetched exactly once (no loss, no double count from the failed attempt)
    val total = flaky.toDF("id")
      .groupBy(expr("id % 32").as("b")).agg(sum("id").as("s"))
      .agg(sum("s")).as[Long].head()
    assert(total == 4999950000L, "retried computation must merge exactly once")
    assert(!FaultToleranceSpec.fail.get(), "the injected failure must actually have fired")
  }

  test("the flagship word count survives an injected failure mid-pipeline") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val clean = operators.TextPipeline.wordCount(docs)
      .as[(String, Long)].collect().toMap
    FaultToleranceSpec.fail.set(true)
    val flakyDocs = docs.as[(Long, String, String, String, Long)]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.attemptNumber() == 0 && FaultToleranceSpec.fail.getAndSet(false))
          throw new RuntimeException("graft injected transient task failure")
        it
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val retried = operators.TextPipeline.wordCount(flakyDocs)
      .as[(String, Long)].collect().toMap
    assert(retried == clean, "word counts must be identical after the retry")
  }
}

object FaultToleranceSpec {
  /** Armed flag: the injection fires exactly once per arm (first attempt of
    * the chosen task), then disarms — shared across attempts because the
    * local test executor runs in this JVM.
    */
  val fail = new java.util.concurrent.atomic.AtomicBoolean(false)
}

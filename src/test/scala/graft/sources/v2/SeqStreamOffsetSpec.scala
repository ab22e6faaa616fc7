package graft.sources.v2

import org.scalatest.funsuite.AnyFunSuite

/** Offset-contract unit spec for [[SeqMicroBatchStream]]: a checkpoint
  * restart hands the fresh instance its committed offset only through
  * `deserializeOffset`, so `latestOffset` must clamp up to it — returning
  * an end below a start the engine already owns violates the monotone-
  * offset contract and stalls the query until `available` catches up.
  */
class SeqStreamOffsetSpec extends AnyFunSuite {

  test("restart: latestOffset never falls below a deserialized committed offset") {
    val s = new SeqMicroBatchStream(n = 1000L, step = 100L, parts = 4)
    // fresh instance: first trigger advances by one step
    assert(s.latestOffset().asInstanceOf[SeqOffset].pos == 100L)
    // simulate restart recovery on a NEW instance: the offset log replays
    // the committed end offset through deserializeOffset before any trigger
    val restarted = new SeqMicroBatchStream(n = 1000L, step = 100L, parts = 4)
    restarted.deserializeOffset("500")
    val next = restarted.latestOffset().asInstanceOf[SeqOffset].pos
    assert(next == 600L, s"latestOffset after restart at 500 must be 600, got $next")
    // committed offset at the end of the sequence: stream stays bounded at n
    val done = new SeqMicroBatchStream(n = 1000L, step = 100L, parts = 4)
    done.deserializeOffset("1000")
    assert(done.latestOffset().asInstanceOf[SeqOffset].pos == 1000L)
  }

  test("planInputPartitions slices exactly the restart delta") {
    val s = new SeqMicroBatchStream(n = 1000L, step = 100L, parts = 4)
    s.deserializeOffset("500")
    val parts = s.planInputPartitions(SeqOffset(500L), SeqOffset(600L))
      .map(_.asInstanceOf[SeqPartition])
    assert(parts.nonEmpty)
    assert(parts.map(p => p.end - p.start).sum == 100L)
    assert(parts.head.start == 500L && parts.last.end == 600L)
  }
}

package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-K aggregator — the UDAF surface demonstrator
  * (SURVEY §7.5): collapses (word, cnt) rows to the K heaviest with a
  * per-partition bounded min-heap, merging heaps of ≤K entries.
  *
  * `orderBy(desc).limit(k)` already plans as `TakeOrderedAndProjectExec`
  * (bounded per-partition heap + driver merge), so this exists to exercise
  * the typed-Aggregator API, and for composition where top-K must be an
  * AGGREGATE inside a larger plan (e.g. top-K per group via groupByKey)
  * rather than a terminal operator.
  *
  * Ordering is total — (cnt DESC, word ASC) — so results are deterministic
  * under ties, matching [[graft.operators.TextPipeline.topN]].
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[(String, Long)]] {

  private def better(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Keep the buffer sorted best-first, truncated to k (k is small). */
  private def insert(buf: List[(String, Long)], x: (String, Long)): List[(String, Long)] = {
    val (pre, post) = buf.span(better(_, x))
    (pre ::: x :: post).take(k)
  }

  override def zero: List[(String, Long)] = Nil
  override def reduce(buf: List[(String, Long)], x: (String, Long)): List[(String, Long)] =
    insert(buf, x)
  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(String, Long)]): Seq[(String, Long)] = buf
  // buffers/results are ≤K entries; kryo keeps the encoder simple for the
  // typed API (the result is consumed via the typed head(), not SQL)
  override def bufferEncoder: Encoder[List[(String, Long)]] =
    Encoders.kryo[List[(String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}

object TopKAggregator {
  /** Typed top-K over a (word, cnt) Dataset. */
  def topK(wc: Dataset[(String, Long)], k: Int): Seq[(String, Long)] = {
    import wc.sparkSession.implicits._
    wc.select(new TopKAggregator(k).toColumn).head()
  }
}

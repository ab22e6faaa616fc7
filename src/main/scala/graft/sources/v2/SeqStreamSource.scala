package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING half of the custom-connector story ([[SeqSource]] = batch
  * read, [[AuditSink]] = batch write): a [[MicroBatchStream]] over the
  * same deterministic sequence. Offsets are row positions; every call to
  * `latestOffset` advances the available range by `step` rows until `n`,
  * so a bounded drain (`processAllAvailable`) sees ⌈n/step⌉ REAL
  * micro-batches, each planned as `parts` contiguous InputPartitions of
  * the (start, end] offset range — exactly the offset→partition contract
  * Kafka's source implements, on a source whose content is reproducible
  * in SQL (`generate_series` + the Knuth-hash value formula).
  *
  * Offset bookkeeping is the part worth demonstrating: `initialOffset`,
  * JSON (de)serialization for the offset log (restart-safe),
  * `planInputPartitions(start, end)` slicing exactly the delta, and
  * `commit` as the watermark for garbage collection (a no-op here — the
  * sequence is stateless; a real source frees buffered data).
  */
class SeqStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqStreamTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("step")).map(_.toLong).getOrElse(100L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

private[v2] case class SeqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[v2] class SeqStreamTable(n: Long, step: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq_stream(n=$n, step=$step, parts=$parts)"
  override def schema(): StructType = SeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SeqSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SeqMicroBatchStream(n, step, parts)
      }
    }
}

/** RESTART CONTRACT (learned the hard way): on checkpoint recovery the
  * engine calls `latestOffset` on the brand-new stream instance BEFORE any
  * `deserializeOffset`, so an instance-local cursor starting at 0 returns
  * an end offset BELOW the committed start; the engine faithfully records
  * that regressed end in the offset log and the NEXT batch spans
  * (regressed → new], redelivering every row in between. The fix is the
  * interface real sources (Kafka) use: [[SupportsAdmissionControl]], whose
  * `latestOffset(start, limit)` is handed the restored start offset by the
  * engine — the rate cursor advances from max(local, committed start), so
  * the produced end can never regress across a restart.
  */
private[v2] class SeqMicroBatchStream(n: Long, step: Long, parts: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  private var available = 0L

  override def initialOffset(): Offset = SeqOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control form — the one the engine actually calls, with the
    * committed/restored start offset (never null: the engine substitutes
    * `initialOffset` on a fresh query).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val base = Option(start).map(_.asInstanceOf[SeqOffset].pos).getOrElse(0L)
    available = math.min(n, math.max(available, base) + step)
    SeqOffset(available)
  }

  /** Legacy no-arg form (unused once SupportsAdmissionControl is
    * implemented; kept for direct unit-spec calls).
    */
  override def latestOffset(): Offset = {
    available = math.min(n, available + step)
    SeqOffset(available)
  }

  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    // second line of defense for the same monotone-offset contract: any
    // offset the engine already owns clamps the local cursor up
    if (pos > available) available = math.min(n, pos)
    SeqOffset(pos)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SeqOffset].pos
    val hi = end.asInstanceOf[SeqOffset].pos
    val total = hi - lo
    if (total <= 0) return Array.empty
    val per = math.max(1L, (total + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (lo + i * per, math.min(hi, lo + (i + 1) * per)))
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SeqPartition(s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(SeqSource.Schema.fieldNames)

  override def commit(end: Offset): Unit = () // stateless source: nothing to GC

  override def stop(): Unit = ()
}

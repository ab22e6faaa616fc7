package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** CUSTOM DataSource V2 CONNECTOR — the extension-API axis the rest of the
  * repo doesn't otherwise exercise (scalar kernels, a Generator, a typed
  * Aggregator, a whole physical operator, an optimizer rule, and now a
  * CONNECTOR): a deterministic synthetic sequence table
  * `spark.read.format("graft.sources.v2.SeqSource").option("n", N)
  * .option("parts", P)`, schema `(id BIGINT, val BIGINT, bucket BIGINT)`
  * with `val = (id * 2654435761) % 1000003` (Knuth multiplicative hash —
  * reproducible on any engine) and `bucket = id % 32`.
  *
  * The scale-relevant parts are REAL, not stubs:
  *  - **Filter pushdown** (`SupportsPushDownFilters`): range/equality
  *    predicates on `id` narrow the generated [lo, hi) interval BEFORE any
  *    row materializes — the connector analog of parquet row-group
  *    pruning. Pushed filters are echoed in `Scan.description()` so plans
  *    (and PlanShapeSpec) show `pushed=[...]` exactly like parquet's
  *    `PushedFilters`. Non-id filters are left for Spark to evaluate
  *    (returned from `pushFilters`, i.e. post-scan residuals).
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): readers emit
  *    only the pruned schema; at 100 TB a connector that materializes all
  *    columns for a 2-column projection is wrong — same rule as parquet
  *    `ReadSchema`.
  *  - **Partition planning**: the [lo, hi) interval splits into `parts`
  *    contiguous `InputPartition`s — the unit of parallelism and locality
  *    a real connector must expose (here: P generator tasks, no shuffle).
  *
  * Reference tie-in: the reference's only source is a hand-rolled HDFS
  * text reader (`greeter_client.cc:298-314`); this is the Spark-idiomatic
  * answer to "add a new source": implement the connector SPI and every
  * operator in the engine composes with it unchanged.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

object SeqSource {
  val Schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)

  val HashMul = 2654435761L
  val HashMod = 1000003L

  def valueOf(id: Long): Long = (id * HashMul) % HashMod
}

private[v2] class SeqTable(n: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq(n=$n, parts=$parts)"
  override def schema(): StructType = SeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, parts)
}

private[v2] class SeqScanBuilder(n: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L // inclusive
  private var hi = n  // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.Schema

  /** Accept only id-range predicates; everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1)
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue())
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue() + 1)
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), parts, required, pushed)
}

private[v2] class SeqScan(lo: Long, hi: Long, parts: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) pushed=[${pushed.mkString(", ")}] cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    val per = math.max(1L, (total + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (lo + i * per, math.min(hi, lo + (i + 1) * per)))
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SeqPartition(s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private[v2] case class SeqPartition(start: Long, end: Long) extends InputPartition

private[v2] class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => cur
          case "val" => SeqSource.valueOf(cur)
          case "bucket" => cur % 32
        })
      override def close(): Unit = ()
    }
  }
}

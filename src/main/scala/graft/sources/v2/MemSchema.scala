package graft.sources.v2

import java.nio.file.{Files, Path}
import org.apache.spark.sql.types._

/** FIELD IDENTITY for schema evolution (the Iceberg model): every table
  * column carries a stable integer id in its StructField metadata,
  * assigned once and NEVER reused. Renames keep the id, drops retire it,
  * adds allocate max+1 — so a data file that records the ids it was
  * written with can be resolved under ANY later schema by id, not by
  * name or position. `_schema.json` round-trips the metadata verbatim
  * (StructType.json), making the assignment durable.
  *
  * Ad-hoc schemas (eq-delete sidecars, spill files, staging dirs before
  * the schema lands) have no ids; both writer and reader then fall back
  * to POSITIONAL ids 1..n, which agree on both sides by construction.
  */
private[v2] object MemSchema {
  val IdKey = "graft.field.id"

  def idOf(f: StructField): Option[Int] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey).toInt) else None

  /** Strip field-id metadata — applied to every NEW table's schema at
    * creation (CREATE / CTAS / REPLACE): a query schema PROPAGATES the
    * source tables' StructField metadata through the plan, so without
    * scrubbing, `CREATE TABLE AS SELECT seg, nat, count(*) ...` would
    * inherit seg/nat's ids from the source while the aggregate columns
    * get fresh ones — a PARTIALLY-stamped schema whose assignment then
    * disagrees with the writer's positional fallback. A new table is a
    * new id space, always 1..n.
    */
  def scrubIds(s: StructType): StructType =
    StructType(s.fields.map { f =>
      if (!f.metadata.contains(IdKey)) f
      else {
        val m = new MetadataBuilder().withMetadata(f.metadata)
          .remove(IdKey).build()
        f.copy(metadata = m)
      }
    })

  /** Per-field ids: the stamped ones when EVERY field has one (the
    * all-or-nothing rule — a half-stamped schema would silently mix two
    * id spaces), positional 1..n otherwise.
    */
  def ids(s: StructType): Array[Int] = {
    val stamped = s.fields.map(idOf)
    if (stamped.nonEmpty && stamped.forall(_.isDefined)) stamped.map(_.get)
    else Array.tabulate(s.length)(_ + 1)
  }

  /** Stamp ids: existing ids are preserved, unstamped fields get fresh
    * ids PAST the table's durable watermark (`_fieldid`) — creation
    * stamps 1..n, ADD COLUMN extends the sequence, RENAME (same field
    * object, new name) keeps its id, and an id retired by DROP is NEVER
    * reused (the current schema's max alone would re-issue it, silently
    * resurrecting the dropped column's bytes under the new name — the
    * exact corruption field ids exist to prevent). The watermark
    * advances BEFORE the schema publishes: a too-high watermark after a
    * crash wastes ids, a too-low one would reuse them.
    */
  def assignIds(dir: Path, s: StructType): StructType = {
    val markFile = dir.resolve("_fieldid")
    val watermark =
      if (Files.exists(markFile))
        scala.util.Try(new String(Files.readAllBytes(markFile), "UTF-8").trim.toInt)
          .getOrElse(0)
      else 0
    var next = math.max(watermark, s.fields.flatMap(idOf).foldLeft(0)(math.max)) + 1
    val stamped = StructType(s.fields.map { f =>
      idOf(f) match {
        case Some(_) => f
        case None =>
          val m = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(IdKey, next.toLong).build()
          next += 1
          f.copy(metadata = m)
      }
    })
    val newMark = stamped.fields.flatMap(idOf).foldLeft(watermark)(math.max)
    if (newMark > watermark)
      Files.write(markFile, newMark.toString.getBytes("UTF-8"))
    stamped
  }

  /** Re-attach the PERSISTED metadata (ids) to a write-side schema by
    * column NAME: Spark reconstructs the write schema through the
    * connector Column API, which does not promise to carry metadata, and
    * a positional fallback would stamp wrong ids on any table whose ids
    * are no longer 1..n (i.e. after a drop). Inserts align to the table
    * schema by name, so the name lookup is exact; fields the persisted
    * schema does not know (never the case for a validated insert) pass
    * through unstamped.
    */
  def alignIds(dest: Path, s: StructType): StructType = {
    if (!Files.exists(dest.resolve("_schema.json"))) return s
    val persisted = MemCatalog.readSchema(dest)
    val byName = persisted.fields.map(f => f.name -> f).toMap
    StructType(s.fields.map(f =>
      byName.get(f.name).fold(f)(p => f.copy(metadata = p.metadata))))
  }

  /** Wire type tags for the v2 file header — the write-time type, so a
    * reader can DECODE (and then discard) a column the current schema
    * has since dropped. One tag per [[MemCatalog.checkSupported]] type.
    */
  def typeTag(dt: DataType): Byte = dt match {
    case LongType => 1
    case IntegerType => 2
    case DoubleType => 3
    case BooleanType => 4
    case StringType => 5
    case ArrayType(LongType, _) => 6
    case TimestampType => 7
    case DateType => 8
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  def tagType(b: Byte): DataType = b match {
    case 1 => LongType
    case 2 => IntegerType
    case 3 => DoubleType
    case 4 => BooleanType
    case 5 => StringType
    case 6 => ArrayType(LongType, containsNull = true)
    case 7 => TimestampType
    case 8 => DateType
    case other => throw new IllegalStateException(s"unknown type tag $other")
  }
}

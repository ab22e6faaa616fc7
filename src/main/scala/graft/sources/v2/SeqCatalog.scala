package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** CUSTOM V2 CATALOG PLUGIN — the last connector-API axis: tables
  * addressable by SQL IDENTIFIER (`graftcat.gen.seq_<n>_<parts>`) instead
  * of `spark.read.format(...)` options, registered with
  * `spark.sql.catalog.graftcat = graft.sources.v2.SeqCatalog` and resolved
  * through Spark's CatalogManager like any Iceberg/Delta/JDBC catalog.
  *
  * The catalog is read-only and virtual: `loadTable` PARSES the table name
  * (`seq` or `seq_<n>_<parts>`) into a [[SeqTable]], so every identifier
  * in the namespace denotes a deterministic table and the full read stack
  * — pushdown, pruning, partition planning — is exactly [[SeqSource]]'s.
  * DDL mutations (`createTable`/`alterTable`/...) correctly refuse rather
  * than stub-succeed.
  *
  * Reference tie-in: the reference hard-codes its one input path
  * (`greeter_client.cc:298-314`); a catalog is the Spark-idiomatic answer
  * to "name your tables": the SAME SQL text runs against any catalog
  * implementation, and the engine's operators compose with catalog tables
  * unchanged (verified by `dsv2_catalog_sql`).
  */
class SeqCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = "graftcat"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** One flat namespace `gen` of generated tables. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("gen")))
      Array(Identifier.of(namespace, "seq"))
    else throw new NoSuchNamespaceException(namespace)

  private val SeqName = """seq_(\d+)_(\d+)""".r

  override def loadTable(ident: Identifier): Table = ident.name() match {
    case "seq" => new SeqTable(1000L, 4)
    case SeqName(n, parts) => new SeqTable(n.toLong, parts.toInt)
    case _ => throw new NoSuchTableException(ident.asInstanceOf[Identifier])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  /** V2 FUNCTION CATALOG — the remaining CatalogPlugin axis: SQL resolves
    * `graftcat.gen.knuth_val(x)` through `loadFunction` like Iceberg's
    * system functions. The bound [[ScalarFunction]] carries BOTH
    * execution paths: `produceResult` (interpreted) and the unboxed
    * MAGIC `invoke(Long): Long` method, which Spark's codegen calls
    * directly — no row boxing on the hot path. The function IS the
    * connector's value formula, so a query applying it to `id` must
    * reproduce the `val` column exactly (the oracle replays the formula).
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("gen")))
      Array(Identifier.of(namespace, "knuth_val"), Identifier.of(namespace, "knuth_checksum"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(Array("gen")) && ident.name() == "knuth_val")
      SeqCatalog.KnuthVal
    else if (ident.namespace().sameElements(Array("gen")) && ident.name() == "knuth_checksum")
      SeqCatalog.KnuthChecksum
    else throw new NoSuchFunctionException(ident)
}

object SeqCatalog {
  /** `knuth_val(id) = (id * 2654435761) % 1000003` as a V2 catalog
    * function (the same formula [[SeqSource]] generates as `val`).
    */
  object KnuthVal extends UnboundFunction {
    override def name(): String = "knuth_val"
    override def description(): String =
      "knuth_val(id BIGINT): the connector's multiplicative-hash value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == LongType,
        s"knuth_val expects one BIGINT argument, got ${inputType.simpleString}")
      new KnuthValBound
    }
  }

  /** Named public class: the MAGIC `invoke` lookup reflects on the bound
    * function's class, and an anonymous class's methods aren't accessible
    * to the MethodHandles lookup (measured: "Couldn't find method invoke
    * with arguments (long)").
    */
  class KnuthValBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "knuth_val"
    override def canonicalName(): String = "graftcat.gen.knuth_val"
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Long =
      SeqSource.valueOf(input.getLong(0))
    /** Magic method: codegen invokes this with the unboxed long. */
    def invoke(id: Long): Long = SeqSource.valueOf(id)
  }

  /** The AGGREGATE half of the V2 FunctionCatalog SPI
    * (`connector.catalog.functions.AggregateFunction`) — the axis
    * [[KnuthVal]]'s ScalarFunction doesn't touch: Spark wraps the bound
    * function in a `V2Aggregator` and drives the full partial/merge/final
    * protocol, so the catalog function participates in map-side partial
    * aggregation like any built-in. `knuth_checksum` is an
    * ORDER-INDEPENDENT multiset checksum (sum of the connector's hash
    * values mod 1000003): associative-commutative by construction, which
    * is exactly the property the distributed merge contract requires —
    * any task/partition schedule must produce the identical result, and
    * the oracle replays the arithmetic in SQL.
    */
  object KnuthChecksum extends UnboundFunction {
    override def name(): String = "knuth_checksum"
    override def description(): String =
      "knuth_checksum(id BIGINT): order-independent sum of knuth_val(id) mod 1000003"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == LongType,
        s"knuth_checksum expects one BIGINT argument, got ${inputType.simpleString}")
      new KnuthChecksumBound
    }
  }

  /** Named public class for the same MethodHandles reason as
    * [[KnuthValBound]]. State is a boxed Long — O(1) bytes per group on
    * every partial, the cheapest possible distributed aggregation state.
    */
  class KnuthChecksumBound extends org.apache.spark.sql.connector.catalog.functions
      .AggregateFunction[java.lang.Long, java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "knuth_checksum"
    override def canonicalName(): String = "graftcat.gen.knuth_checksum"
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
    override def newAggregationState(): java.lang.Long = 0L
    override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state
      else (state + SeqSource.valueOf(input.getLong(0))) % 1000003L
    override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
      (a + b) % 1000003L
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }
}

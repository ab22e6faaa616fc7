package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class SeqCatalog extends TableCatalog {
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
}

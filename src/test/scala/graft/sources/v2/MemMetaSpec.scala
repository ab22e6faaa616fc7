package graft.sources.v2

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Metadata-table contracts behind the oracle-gated `dsv2_metadata_tables`
  * query: the files relation mirrors the live manifest entry-for-entry,
  * history hides vacuumed versions (it reports exactly what time travel
  * can still reach), MoR deletion vectors and applicable eq-deletes
  * surface per file, and a REAL table whose flat name collides with a
  * handle suffix shadows the handle (resolution order).
  */
class MemMetaSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graftmem", classOf[MemCatalog].getName)
    s
  }

  private def tdir(name: String) = Paths.get(
    sys.props("java.io.tmpdir"), "graft-memcat-graftmem", s"tmp__$name")

  test("files relation mirrors the live manifest; history hides vacuumed versions") {
    spark.sql("DROP TABLE IF EXISTS graftmem.tmp.meta_t")
    spark.sql("CREATE TABLE graftmem.tmp.meta_t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftmem.tmp.meta_t SELECT id, id FROM range(0, 10)")
    spark.sql("INSERT INTO graftmem.tmp.meta_t SELECT id, id FROM range(10, 15)")
    val dir = tdir("meta_t")
    val live = MemCatalog.liveEntries(dir)
      .map(e => (e.name, e.stats.get("#rows").map(_._1), MemCatalog.seqOf(e)))
      .toSet
    val rel = spark.sql("SELECT name, n_rows, seq FROM graftmem.tmp.meta_t.files")
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .toSet
    assert(rel == live, "the files relation must mirror the live manifest")
    val preVersions = spark.sql("SELECT version FROM graftmem.tmp.meta_t.history")
      .collect().map(_.getInt(0)).toSet
    assert(preVersions == Set(0, 1, 2))
    MemCatalog.vacuum(dir, keepVersions = 1)
    val postVersions = spark.sql("SELECT version FROM graftmem.tmp.meta_t.history")
      .collect().map(_.getInt(0)).toSet
    assert(postVersions == Set(2),
      s"history must report only retained snapshots, got $postVersions")
  }

  test("MoR vectors and eq-deletes surface per file") {
    spark.sql("DROP TABLE IF EXISTS graftmem.tmp.meta_m")
    spark.sql(
      """CREATE TABLE graftmem.tmp.meta_m
        |TBLPROPERTIES ('graft.dml'='mor', 'graft.eqDeleteKeys'='k') AS
        |SELECT CAST(id AS BIGINT) AS k, CAST(id AS BIGINT) AS v
        |FROM range(0, 9)""".stripMargin)
    spark.sql("DELETE FROM graftmem.tmp.meta_m WHERE v = 3") // positional DV
    spark.sql("DELETE FROM graftmem.tmp.meta_m WHERE k = 5") // eq-delete sidecar
    val rows = spark.sql(
      "SELECT has_dv, n_eqdels FROM graftmem.tmp.meta_m.files")
      .collect().map(r => (r.getBoolean(0), r.getInt(1)))
    assert(rows.exists(_._1), "at least one file must carry a deletion vector")
    assert(rows.exists(_._2 > 0), "the eq-delete must apply to at least one file")
  }

  test("a real table of the flat name shadows the metadata handle") {
    spark.sql("DROP TABLE IF EXISTS graftmem.tmp.history")
    spark.sql("CREATE TABLE graftmem.tmp.history AS " +
      "SELECT CAST(1 AS BIGINT) AS real_col")
    val cols = spark.table("graftmem.tmp.history").columns.toSeq
    assert(cols == Seq("real_col"),
      "a real table named 'history' must win over the handle")
    spark.sql("DROP TABLE graftmem.tmp.history")
  }
}

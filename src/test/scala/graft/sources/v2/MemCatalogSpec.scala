package graft.sources.v2

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The ATOMICITY contracts of the writable staging catalog — the part the
  * oracle-gated round-trip (`dsv2_catalog_ctas`) can't show: what happens
  * when the write FAILS halfway.
  */
class MemCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(tag: String): String = {
    val name = s"graftmemspec_$tag"
    val root = java.nio.file.Files.createTempDirectory(s"graft-memcat-spec-$tag")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[MemCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root.toString)
    name
  }

  test("CTAS round-trip: create, read back, drop") {
    val cat = freshCatalog("rt")
    spark.sql(s"CREATE TABLE $cat.t.base AS SELECT id, id * 2 AS dbl, " +
      "concat('v', id) AS s FROM range(100)")
    val back = spark.sql(s"SELECT count(*) AS n, sum(dbl) AS sd FROM $cat.t.base").collect()(0)
    assert(back.getLong(0) == 100 && back.getLong(1) == 9900)
    // column pruning reaches the catalog scan
    val p = spark.sql(s"SELECT s FROM $cat.t.base").queryExecution.executedPlan.toString
    assert(p.contains("cols=s"), s"pruned read expected:\n$p")
    spark.sql(s"DROP TABLE $cat.t.base")
    intercept[AnalysisException](spark.sql(s"SELECT * FROM $cat.t.base").collect())
  }

  test("a failing CTAS leaves NO table (staged changes aborted)") {
    val cat = freshCatalog("abort")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t.bad AS " +
        "SELECT id, assert_true(id < 10, 'boom') AS a FROM range(100)").collect()
    }
    val err = intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.t.bad").collect()
    }
    assert(err.getMessage.toLowerCase.contains("table or view not found") ||
      err.getCondition != null && err.getCondition.contains("TABLE_OR_VIEW_NOT_FOUND"),
      s"failed CTAS must publish nothing, got: ${err.getMessage}")
  }

  test("a failing REPLACE keeps the OLD table intact and readable") {
    val cat = freshCatalog("rtas")
    spark.sql(s"CREATE TABLE $cat.t.keep AS SELECT id FROM range(7)")
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.t.keep AS " +
        "SELECT id, assert_true(false, 'boom') AS a FROM range(100)").collect()
    }
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t.keep").collect()(0).getLong(0) == 7,
      "old data must survive a failed replace")
  }

  test("INSERT INTO appends through the two-phase commit; nulls survive the codec") {
    val cat = freshCatalog("ins")
    spark.sql(s"CREATE TABLE $cat.t.app AS SELECT id, concat('v', id) AS s FROM range(3)")
    spark.sql(s"INSERT INTO $cat.t.app VALUES (99, NULL)")
    val rows = spark.sql(s"SELECT id, s FROM $cat.t.app ORDER BY id").collect()
    assert(rows.length == 4)
    assert(rows.last.getLong(0) == 99 && rows.last.isNullAt(1))
  }

  test("DELETE removes matching rows; unsupported predicate shapes are refused") {
    val cat = freshCatalog("del")
    spark.sql(s"CREATE TABLE $cat.t.d AS SELECT id, id % 4 AS grp FROM range(40)")
    spark.sql(s"DELETE FROM $cat.t.d WHERE grp = 1")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t.d").collect()(0).getLong(0) == 30)
    // range predicates are NOT in the supported exact-match shapes: the
    // statement must fail loudly, not delete the wrong rows
    intercept[Exception](spark.sql(s"DELETE FROM $cat.t.d WHERE id > 35"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t.d").collect()(0).getLong(0) == 30,
      "a refused DELETE must not change the table")
    // IN + IS NULL shapes are supported
    spark.sql(s"DELETE FROM $cat.t.d WHERE grp IN (2, 3)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t.d").collect()(0).getLong(0) == 10)
  }

  test("the V2 catalog function resolves by SQL identifier and matches the generator") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[SeqCatalog].getName)
    val r = spark.sql(
      "SELECT count(*) AS n, count(CASE WHEN graftcat.gen.knuth_val(id) = val THEN 1 END) AS ok " +
        "FROM graftcat.gen.seq_1000_2").collect()(0)
    assert(r.getLong(0) == 1000 && r.getLong(1) == 1000,
      "knuth_val(id) must reproduce the connector's val column on every row")
    intercept[Exception](
      spark.sql("SELECT graftcat.gen.nope(1)").collect())
  }

  test("_file metadata column reports row provenance; SHOW TABLES lists the namespace") {
    val cat = freshCatalog("meta")
    spark.sql(s"CREATE TABLE $cat.t.prov (id BIGINT, s STRING)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO $cat.t.prov VALUES ($i, 'r$i')"))
    val files = spark.sql(s"SELECT _file FROM $cat.t.prov").collect().map(_.getString(0))
    assert(files.length == 3 && files.distinct.length == 3,
      "three single-row inserts must land in three part files, each row naming its own")
    assert(files.forall(_.startsWith("part-")))
    // unselected metadata costs nothing: the plain read's scan prunes it
    val p = spark.sql(s"SELECT id FROM $cat.t.prov").queryExecution.executedPlan.toString
    assert(p.contains("cols=id"), s"unselected _file must not be decoded:\n$p")
    val listed = spark.sql(s"SHOW TABLES IN $cat.t").collect().map(_.getString(1))
    assert(listed.contains("prov"))
  }

  test("plain CREATE TABLE refuses to overwrite; REPLACE on a missing table refuses") {
    val cat = freshCatalog("ddl")
    spark.sql(s"CREATE TABLE $cat.t.once AS SELECT id FROM range(2)")
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.t.once AS SELECT id FROM range(2)"))
    intercept[Exception](
      spark.sql(s"REPLACE TABLE $cat.t.missing AS SELECT id FROM range(2)"))
  }
}

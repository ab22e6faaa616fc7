package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink surface. The reference's only sink is an overwrite of one text file
  * on HDFS via a shell pipe (`hdfs dfs -put -f -`, `greeter_server.cc:
  * 115-121`) — single-writer, driver-side. Every sink here is a distributed
  * write: one file per partition, committed via the Hadoop output protocol
  * (the `-f` overwrite flag maps to `SaveMode.Overwrite`).
  *
  * Scale notes: parquet is the default interchange (columnar, splittable,
  * statistics for pushdown on re-read); `partitionBy` lays out hive-style
  * directories so downstream reads prune partitions; `coalesce`/
  * `repartition(n)` before a sink controls file count (small-files problem
  * at 100 TB is real — aim for ~128 MB-1 GB files).
  */
object Sinks {

  /** The reference's sink format: `word<space>count` text lines, overwrite
    * (`greeter_server.cc:115-121`).
    */
  def writeWordCountText(wc: DataFrame, path: String): Unit =
    wc.select(concat_ws(" ", col("word"), col("cnt")))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Raw line-per-row text — the reference's corpus format
    * (`greeter_client.cc:298-331` reads exactly this shape): a single
    * string column, one line per row.
    */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned parquet: downstream scans prune on the
    * partition column (`PartitionFilters` in explain).
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", sep).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar interchange (predicate pushdown + column
    * pruning behave like parquet's; useful when the downstream stack is
    * Hive/ORC-native).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Z-ordered parquet write: range-partition + sort by the Morton value
    * so each output file covers a narrow range of EVERY interleaved
    * dimension — parquet row-group min/max stats then prune selective
    * filters on any of those columns, not just the sort-leading one.
    * The 100 TB data-skipping layout for multi-dimension query patterns
    * (compute z with `Relational.zValueExpr`).
    */
  def writeZOrdered(df: DataFrame, path: String, zCol: String, nFiles: Int = 8): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed + sorted table write (hash-bucketed by `bucketCol` into `n`
    * buckets): joins/aggregations on the bucket column against another
    * table bucketed the same way need NO shuffle at read time — the
    * pre-shuffle is paid once at write. Requires `saveAsTable` (bucket
    * metadata lives in the catalog, not the files).
    */
  def writeBucketedTable(df: DataFrame, tableName: String, bucketCol: String,
      n: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(tableName)
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify/Bench/tests.
  *
  * The reference's whole control plane — 1 s heartbeat polling, 4 s
  * (disabled) timeout, death-triggered task reassignment, the `tasks==4`
  * stage barrier (`greeter_client.cc:136-294`) — maps to Spark scheduler
  * CONFIG, not code: `spark.executor.heartbeatInterval` (10s),
  * `spark.network.timeout` (120s), `spark.task.maxFailures` (4), stage
  * barriers from the DAGScheduler. We only tune what differs from a good
  * cluster default.
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    build(s"local[$cpus]", cpus.toInt, appName)
  }

  def build(master: String, shufflePartitions: Int, appName: String): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      // match local core count, not the 200 default sized for clusters
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE: runtime partition coalescing, skew-join splitting, plan re-opt
      .config("spark.sql.adaptive.enabled", "true")
      // small fixture files are one row-group: without a floor, explosive
      // map stages (shingling, tokenize) pin to one task. This is the
      // declarative form of a manual repartition-if-narrow — scans already
      // wider than the floor are untouched (the 100 TB case), and no
      // query-build-time RDD/plan introspection is needed.
      .config("spark.sql.files.minPartitionNum", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // RocksDB is the production state-store backend for every streaming
      // run (changelog-checkpointed, spills off-heap). Pinned ONCE here —
      // builder options propagate to spark.newSession() clones — so no
      // query ever set/restores the session-global key (a concurrent
      // restore could flip a restart query's second incarnation back to
      // the HDFS provider mid-recovery). Batch plans never read this key.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // storage-partitioned joins: when two V2 scans report the same
      // KeyGroupedPartitioning (the connector's align=bucket layout), the
      // join plans with ZERO exchanges — the Iceberg/Delta bucketed-join
      // contract. Off by default upstream only for legacy compatibility.
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // ...and let co-partitioning count when the join keys are a SUPERSET
      // of the reported partition keys (join on (bucket, id), layout on
      // bucket): clustering by bucket already co-locates every (bucket,id)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // events.ts is TIMESTAMP(NANOS); surface as long, converted in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}

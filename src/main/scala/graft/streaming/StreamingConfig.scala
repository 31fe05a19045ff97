package graft.streaming

import org.apache.spark.sql.SparkSession

/** Production state-store configuration for the streaming operators
  * (SURVEY §12): the default HDFS-backed provider keeps every store's
  * working set on the executor HEAP — fine for the bounded per-user
  * session state here at test scale, but at 100 TB-pipeline state sizes
  * (dedup fingerprint stores, high-cardinality session keys) the heap
  * becomes the limit and full-snapshot checkpoints dominate commit
  * latency. The productionized shape is RocksDB state + changelog
  * checkpointing, all public Spark configs (SPARK-43421 et al.), no
  * vendor extensions:
  *
  *  - `RocksDBStateStoreProvider`: state lives off-heap/on-disk per
  *    executor; working memory bounded via the block-cache settings
  *    instead of growing with key cardinality.
  *  - changelog checkpointing: per-commit uploads are the DELTA since
  *    the last commit (the changelog), with periodic snapshot
  *    compaction in the background — commit latency stops scaling with
  *    total state size.
  *  - `boundedMemoryUsage` + `maxMemoryUsageMB`: one shared RocksDB
  *    memory budget per executor, so a skewed partition cannot OOM the
  *    JVM from native allocations.
  *  - `trackTotalNumberOfRows=false`: drops a per-commit full-store
  *    count scan whose only product is a metrics gauge.
  *  - `minDeltasForSnapshot` / `minBatchesToRetain`: snapshot cadence
  *    and checkpoint retention — how far back a failed driver can
  *    restart and how much history the store keeps.
  *
  * There is no multi-executor cluster in this harness to measure the
  * recovery-latency claims, so this module is deliberately
  * configuration + wiring only; StreamingStateStoreSpec proves the
  * RocksDB provider actually drives our stateful operators (the
  * rocksdbjni native library ships with Spark) and produces
  * bit-identical output to the default provider.
  */
object StreamingConfig {

  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The production state-store conf set. `maxMemoryUsageMB` is the
    * per-executor shared RocksDB budget — size it like a shuffle
    * buffer, not like total state (state spills to local disk).
    */
  def productionStateStore(maxMemoryUsageMB: Int = 512): Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDBProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> maxMemoryUsageMB.toString,
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false",
    "spark.sql.streaming.stateStore.minDeltasForSnapshot" -> "10",
    "spark.sql.streaming.minBatchesToRetain" -> "2")

  /** Apply the production set to a session (per-query confs — read at
    * stream start, so call before `.start()`).
    */
  def applyProduction(spark: SparkSession, maxMemoryUsageMB: Int = 512): Unit =
    productionStateStore(maxMemoryUsageMB).foreach { case (k, v) => spark.conf.set(k, v) }
}

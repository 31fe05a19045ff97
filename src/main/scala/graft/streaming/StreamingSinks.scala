package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Idempotent streaming publication (SURVEY.md §2.10 extension): the
  * sink side of the exactly-once story that the RocksDB state-store
  * work covers for state.
  *
  * Structured Streaming's `foreachBatch` contract is AT-LEAST-ONCE:
  * after a crash between the batch function and the commit log write,
  * the SAME `batchId` is replayed with the SAME data (file sources +
  * checkpointing make the batch contents deterministic). An append-mode
  * writer therefore duplicates the replayed batch. Exactly-once
  * publication = make the batch function idempotent, keyed by
  * `batchId`:
  *
  *   - [[publishBatch]] writes every batch into its own
  *     `batch_id=<id>` partition with DYNAMIC partition overwrite —
  *     a replay replaces exactly its own partition and nothing else.
  *     Readers see `outDir` as a plain parquet table (`batch_id` is a
  *     normal partition column, pruned on read).
  *   - For sinks without atomic partition replace (JDBC, key-value
  *     stores), the same key travels as a column: MERGE/upsert on
  *     (batch_id, row key) gives the identical replay-safety — the
  *     deterministic batch id IS the dedup key.
  *
  * Scale shape: the write adds no shuffle (partitionBy on a constant
  * per-batch value creates one directory, not an exchange); overwrite
  * scope is one partition, so replay cost is bounded by the batch, not
  * the table.
  */
object StreamingSinks {

  /** The idempotent batch function: publish `batch` as partition
    * `batch_id=<batchId>` of the parquet table at `outDir`, replacing
    * that partition if the batch is a replay. Pure function of
    * (batch contents, batchId) — calling it twice is a no-op the
    * second time.
    */
  def publishBatch(batch: Dataset[Row], batchId: Long, outDir: String): Unit = {
    val spark = batch.sparkSession
    // dynamic mode scopes the overwrite to the partitions present in
    // the write (exactly one: this batch) instead of truncating the
    // whole table — the property that makes replay idempotent AND
    // concurrent-batch-safe
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** The MERGE leg of the idempotent-batch story, for sinks WITHOUT
    * atomic partition replace (JDBC, key-value stores): apply `batch`
    * onto the keyed table `base` via [[graft.ops.Joins.upsert]] on the
    * row key, with the deterministic `batchId` stamped as a plain
    * column. Replay safety is MERGE semantics, not partition replace:
    * a replayed row lands on its own key and overwrites its earlier
    * write, so an at-least-once replay can never produce a duplicate
    * key — calling this twice with the same (batch, batchId) is a
    * fixpoint. One full-outer shuffle join keyed by the row key;
    * pre-bucketed base tables make it exchange-free.
    */
  def mergeBatch(
      base: DataFrame,
      batch: Dataset[Row],
      batchId: Long,
      keys: Seq[String]): DataFrame =
    graft.ops.Joins.upsert(base, batch.withColumn("batch_id", lit(batchId)), keys)

  /** Exactly-once keyed MERGE sink: `foreachBatch` read-modify-write
    * of a parquet table through [[mergeBatch]] — the composition a
    * JDBC/KV sink uses where `publishBatch`'s partition overwrite is
    * unavailable (the parquet RMW stands in for the store's MERGE).
    * `localCheckpoint` snapshots the merged result before the write
    * because the overwrite replaces its own input files.
    */
  def keyedMergeSink(
      df: DataFrame,
      tableDir: String,
      checkpointDir: String,
      keys: Seq[String]): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val stamped = batch.withColumn("batch_id", lit(batchId))
        val next =
          if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tableDir))) stamped
          else mergeBatch(spark.read.parquet(tableDir), batch, batchId, keys)
            .localCheckpoint(true)
        next.write.mode("overwrite").parquet(tableDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Exactly-once-per-batch parquet sink: `foreachBatch` over
    * [[publishBatch]] with checkpointed offsets, so each source batch
    * is published once even across driver restarts mid-batch.
    */
  def idempotentParquetSink(
      df: DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        publishBatch(batch, batchId, outDir))
      .trigger(Trigger.AvailableNow())
      .start()
}

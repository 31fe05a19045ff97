package graft

import graft.streaming.{StreamingSessions, StreamingSinks}
import org.apache.spark.sql.functions._

/** Exactly-once-per-batch sink semantics (SURVEY §12): `foreachBatch`
  * is at-least-once — a crash between the batch function and the
  * commit log replays the same batchId with the same data — so the
  * batch function must be idempotent. StreamingSinks keys every write
  * by `batch_id` with dynamic partition overwrite; this spec replays a
  * batch verbatim and asserts the table is unchanged (the duplicate
  * row count an append sink would produce never appears), and replays
  * a corrected batch to show the replacement is scoped to that batch's
  * partition alone.
  */
class StreamingSinkSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("streamed publication lands once; verbatim batch replay adds zero rows") {
    val out = tmpDir("sink-out")
    val ckpt = tmpDir("sink-ckpt")
    // FileStreamSource wants a directory (runBounded's symlink wrap)
    val srcFile = java.nio.file.Paths.get(s"${sf("sf0.001")}/events.parquet")
    val srcDir = java.nio.file.Files.createTempDirectory("sink-src")
    java.nio.file.Files.createSymbolicLink(srcDir.resolve(srcFile.getFileName), srcFile)
    val src = StreamingSessions
      .eventStream(spark, srcDir.toString)
      .select(col("event_id"), col("user_id"), col("event_type"))
    StreamingSinks.idempotentParquetSink(src, out, ckpt).awaitTermination()

    val table = spark.read.parquet(out)
    val n0 = table.count()
    val expected = graft.core.Tables.events(spark, sf("sf0.001")).count()
    assert(n0 == expected, "streamed publication must cover the bounded source once")
    // partition-directory inference reads batch_id back as int
    val batchIds = table.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(batchIds.nonEmpty)

    // simulate the crash-replay: re-run the batch function with the
    // SAME content and batchId it already committed
    val lastId = batchIds.last
    val replay = spark.read.parquet(out)
      .filter(col("batch_id") === lastId).drop("batch_id")
      .localCheckpoint(true) // snapshot: the write overwrites its own input files
    StreamingSinks.publishBatch(replay, lastId, out)
    assert(spark.read.parquet(out).count() == n0,
      "verbatim replay must be a no-op, not an append")
  }

  test("replayed batch replaces ONLY its own partition") {
    val out = tmpDir("sink-out2")
    import spark.implicits._
    StreamingSinks.publishBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L, out)
    StreamingSinks.publishBatch(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), 1L, out)
    // batch 1 is replayed after a partial failure with one row fewer
    StreamingSinks.publishBatch(Seq((3L, "c2")).toDF("id", "v"), 1L, out)
    val rows = spark.read.parquet(out)
      .select(col("batch_id").cast("long"), col("id"), col("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c2")),
      "replay must replace the batch_id=1 partition and leave batch_id=0 intact")
  }

  test("MERGE leg: batch replay through Joins.upsert is a fixpoint — zero duplicate keys") {
    import spark.implicits._
    // the keyed-table pattern for sinks without atomic partition
    // replace: (batch_id, key) travels as columns, replay lands on the
    // same key and overwrites its own earlier write
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "v", "batch_id")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    val t1 = StreamingSinks.mergeBatch(
      StreamingSinks.mergeBatch(empty, b0, 0L, Seq("id")), b1, 1L, Seq("id"))
    // crash-replay: the SAME batchId with the SAME data
    val t1r = StreamingSinks.mergeBatch(t1, b1, 1L, Seq("id"))
    assert(t1r.as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 0L), (2L, "b2", 1L), (3L, "c", 1L)))
    assert(t1r.groupBy("id").count().filter(col("count") > 1).count() == 0,
      "an append sink would have duplicated keys 2 and 3 here")
    // corrected replay replaces the value in place, still keyed-once
    val t1c = StreamingSinks.mergeBatch(
      t1r, Seq((3L, "c-fixed")).toDF("id", "v"), 1L, Seq("id"))
    assert(t1c.as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 0L), (2L, "b2", 1L), (3L, "c-fixed", 1L)))
  }

  test("keyedMergeSink: streamed keyed table has one row per key; verbatim batch replay changes nothing") {
    val table = tmpDir("merge-out") + "/t" // must not pre-exist
    val ckpt = tmpDir("merge-ckpt")
    val srcFile = java.nio.file.Paths.get(s"${sf("sf0.001")}/events.parquet")
    val srcDir = java.nio.file.Files.createTempDirectory("merge-src")
    java.nio.file.Files.createSymbolicLink(srcDir.resolve(srcFile.getFileName), srcFile)
    val src = StreamingSessions
      .eventStream(spark, srcDir.toString)
      .select(col("event_id"), col("user_id"), col("event_type"))
    StreamingSinks.keyedMergeSink(src, table, ckpt, Seq("event_id")).awaitTermination()

    val t = spark.read.parquet(table)
    val expected = graft.core.Tables.events(spark, sf("sf0.001"))
      .select("event_id").distinct().count()
    assert(t.count() == expected, "keyed table must hold one row per source key")
    assert(t.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    // crash-replay the latest batch verbatim through the same merge
    val lastId = t.agg(max(col("batch_id"))).collect().head.getLong(0)
    val replay = t.filter(col("batch_id") === lastId).drop("batch_id")
      .localCheckpoint(true)
    StreamingSinks.mergeBatch(spark.read.parquet(table), replay, lastId, Seq("event_id"))
      .localCheckpoint(true)
      .write.mode("overwrite").parquet(table)
    val after = spark.read.parquet(table)
    assert(after.count() == expected, "verbatim replay must be a fixpoint")
    assert(after.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }
}

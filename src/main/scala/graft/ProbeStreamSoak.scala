package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming soak (VERDICT r14 item 7): the CHAINED two-stateful-op
  * topology — q310 full-outer click/purchase interval join feeding a
  * per-user tumbling-window attribution count
  * ([[graft.streaming.StreamingIntervalJoin.attributionWindowCounts]])
  * — driven as a REAL multi-batch stream over ×`rep` events (default
  * ×100 ≈ 4M click/purchase rows from sf0.1), with:
  *
  *  - per-operator STATE sizes read off StreamingQueryProgress
  *    (max rows / bytes across batches — the state-bound evidence);
  *  - ZERO-PHANTOM / ZERO-DROP parity vs the batch twin (the same
  *    function over batch frames): every emitted row must exist in the
  *    batch result, and every batch window the final watermark closed
  *    must have been emitted.
  *
  * Feeds are written time-CLUSTERED (range-partitioned by ts) and read
  * with maxFilesPerTrigger, so AvailableNow replays them as many
  * micro-batches whose watermark advances in event-time order — the
  * soak exercises cross-batch state handoff, not one mega-batch.
  *
  * `tools/probe.sh graft.ProbeStreamSoak [sfDir] [rep]`
  */
object ProbeStreamSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val filesPerTrigger = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ×rep: replicate each event per replica index, remapping user_id
    // (and event_id uniqueness) so per-user densities stay realistic
    // while the user population scales — the ProbeScaleCohort recipe.
    val ev = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(explode(sequence(lit(0L), lit(rep - 1L))).as("__r"), col("*"))
      .select(
        (col("user_id") * rep + col("__r")).as("user_id"),
        col("ts"),
        (col("event_id") * rep + col("__r")).as("event_id"),
        col("event_type"))
      .localCheckpoint(true)
    val work = java.nio.file.Files.createTempDirectory("soak").toString
    val (clickDir, purchDir) = (s"$work/clicks", s"$work/purchases")
    graft.core.Sinks.writeClusteredParquet(
      ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id"), clickDir, Seq("ts"), numFiles = 40)
    graft.core.Sinks.writeClusteredParquet(
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id"), purchDir, Seq("ts"), numFiles = 40)
    // FileStreamSource batches files in MODIFICATION-TIME order, and a
    // parallel write stamps near-identical mtimes — batches then pull
    // arbitrary ts ranges, the watermark jumps ahead, and whole earlier
    // files become late data (first soak run: 3900 false organics,
    // 561k dropped windows at x100). Stamp mtimes in path order ==
    // range-cluster order == event-time order, so the replay is a
    // time-ordered feed (what a production log shipper delivers).
    def orderMtimes(dir: String): Unit = {
      val fs = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      var t = System.currentTimeMillis() - fs.length * 2000L
      fs.foreach { f => f.setLastModified(t); t += 2000L }
    }
    orderMtimes(clickDir)
    orderMtimes(purchDir)
    val nClicks = ev.filter(col("event_type") === "click").count()
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    println(s"[soak] feeds: $nClicks clicks, $nPurch purchases (rep=$rep)")

    def feed(dir: String) = spark.readStream
      .schema("user_id long, ts timestamp, event_id long")
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(dir)

    val t0 = System.nanoTime()
    val q = graft.streaming.StreamingIntervalJoin
      .attributionWindowCounts(feed(clickDir), feed(purchDir))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("w_start_us"),
        unix_micros(col("w.end")).as("w_end_us"),
        col("n_attributed"), col("n_organic"))
      .writeStream
      .format("memory")
      .queryName("soak_attrib")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9

    // per-operator state high-water marks across all micro-batches
    val progress = q.recentProgress.toSeq
    val opMax = progress
      .flatMap(_.stateOperators.toSeq)
      .groupBy(_.operatorName)
      .map { case (name, ops) =>
        (name, ops.map(_.numRowsTotal).max, ops.map(_.memoryUsedBytes).max)
      }
    opMax.toSeq.sortBy(_._1).foreach { case (name, rows, bytes) =>
      println(f"[soak] state $name: max $rows rows, ${bytes / 1e6}%.1f MB")
    }
    println(f"[soak] ${progress.length} batches, $wallS%.1f s stream wall")

    val streamed = spark.table("soak_attrib")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // batch twin: the SAME operator over batch frames (watermarks are
    // no-ops in batch) — the complete, cutoff-free result
    def batchFeed(dir: String) = spark.read.parquet(dir)
    val batch = graft.streaming.StreamingIntervalJoin
      .attributionWindowCounts(batchFeed(clickDir), batchFeed(purchDir))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("w_start_us"),
        unix_micros(col("w.end")).as("w_end_us"),
        col("n_attributed"), col("n_organic"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val phantoms = streamed -- batch
    // closed set: the final joint watermark W = min(click max − 1h,
    // purchase max − 30min); the downstream agg's delayed watermark is
    // W − lookback (the join may emit organic rows up to lookback late),
    // so every batch window with end ≤ W − lookback must have emitted.
    val w = spark.read.parquet(clickDir)
      .select(max(unix_micros(col("ts"))) - 3600000000L).as[Long].head()
      .min(spark.read.parquet(purchDir)
        .select(max(unix_micros(col("ts"))) - 1800000000L).as[Long].head())
    val mustEmit = batch.filter(_._3 <= w - 1800000000L)
    val dropped = mustEmit -- streamed
    println(s"[soak] streamed=${streamed.size} batch=${batch.size} " +
      s"closed=${mustEmit.size} phantoms=${phantoms.size} dropped=${dropped.size}")
    val batchByKey = batch.groupBy(r => (r._1, r._2, r._3))
    phantoms.take(3).foreach { r =>
      println(s"[soak] PHANTOM $r batch-side=" +
        batchByKey.getOrElse((r._1, r._2, r._3), Set.empty))
    }
    val streamByKey = streamed.groupBy(r => (r._1, r._2, r._3))
    dropped.take(3).foreach { r =>
      println(s"[soak] DROPPED $r stream-side=" +
        streamByKey.getOrElse((r._1, r._2, r._3), Set.empty))
    }
    assert(phantoms.isEmpty && dropped.isEmpty,
      "soak parity violated — see PHANTOM/DROPPED lines")
    println("[soak] zero-phantom / zero-drop parity PASS")
    spark.stop()
  }
}

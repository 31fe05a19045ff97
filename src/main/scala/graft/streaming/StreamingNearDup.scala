package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming NEAR-dup candidate generation — the continuously-ingesting
  * form of the batch MinHash-LSH pipeline (SURVEY §2.10 extension):
  * signatures and band keys are computed ROW-LOCALLY on the stream
  * (the same native WordShingles → MinHashSignature scan expressions
  * and md5 band keys as [[graft.dedup.Dedup.lshBands]], so a doc gets
  * the identical band keys in both engines' modes), and each
  * (band_idx, band_key) bucket is a `flatMapGroupsWithState` group
  * whose state is the bucket's member ids. A new arrival emits one
  * candidate pair per prior member, then joins the state — the
  * incremental equivalent of the batch self-join.
  *
  * Bucket cap: like the batch `maxBucketSize` guard, a bucket that
  * EXCEEDS `maxBucketSize` stops producing (state poisons, quadratic
  * cost bounded). The one semantic divergence from batch is inherent
  * to streaming: batch drops an over-cap bucket retroactively, a
  * stream has already emitted the pairs that arrived before the cap
  * tripped — so streaming emits a superset on exactly the buckets the
  * batch guard drops. The parity spec pins EXACT pair-set equality on
  * corpora whose buckets stay under the cap.
  *
  * State discipline at scale: the state IS the LSH index — one entry
  * per occupied bucket, ≤ cap ids each, growing with corpus buckets,
  * not with time. That is precisely the state-size regime
  * [[StreamingConfig.productionStateStore]] exists for (RocksDB +
  * changelog checkpointing); no timeout is set because an index entry
  * never expires — use the dedup-horizon variant (watermark timeout)
  * when only a sliding window of the corpus must be searchable.
  */
object StreamingNearDup {

  case class BandRow(band_idx: Int, band_key: String, doc_id: Long)
  case class BucketState(ids: List[Long], poisoned: Boolean)
  case class CandPair(id_a: Long, id_b: Long)

  /** The state transition (public: unit-testable without a stream).
    * Ids within one invocation are processed in ascending order so a
    * single-batch bounded run is deterministic; across micro-batches
    * the emitted SET for uncapped buckets is arrival-order-independent.
    */
  def updateBucket(maxBucketSize: Int)(
      key: (Int, String),
      rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[CandPair] = {
    var st = state.getOption.getOrElse(BucketState(Nil, poisoned = false))
    val out = Seq.newBuilder[CandPair]
    rows.map(_.doc_id).toArray.distinct.sorted.foreach { id =>
      if (!st.poisoned && !st.ids.contains(id)) {
        if (st.ids.size >= maxBucketSize) st = st.copy(poisoned = true)
        else {
          st.ids.foreach(o => out += CandPair(math.min(o, id), math.max(o, id)))
          st = st.copy(ids = id :: st.ids)
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Row-local banding of a (doc) stream or frame — identical band
    * keys to `lshBands(minhashSignaturesInline(...))`.
    */
  def bandRows(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        org.apache.spark.sql.graft.MinHashSignature(
          graft.functions.TextFunctions.wordShingles(col(textCol), shingleN),
          numHashes).as("sig"))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(
            lit(b).as("band_idx"),
            md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
              .as("band_key"))
        }: _*)).as("band"))
      .select(col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"), col("doc_id"))
  }

  /** Candidate pairs from a streaming doc source: band scan-side, one
    * stateful group per bucket. Caller dedups pairs across bands
    * downstream (same contract as the batch `lshCandidatePairs`
    * pre-DISTINCT stage).
    */
  def candidates(
      docStream: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      maxBucketSize: Int = 100): DataFrame = {
    val spark = docStream.sparkSession
    import spark.implicits._
    bandRows(docStream, textCol, idCol, shingleN, numHashes, bands)
      .as[BandRow]
      .groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateBucket(maxBucketSize))
      .toDF()
  }

  /** Bounded harness: run the streaming candidate generator over a
    * parquet documents file into an in-memory sink (mirrors
    * [[StatefulSessions.runBounded]]).
    */
  def runBounded(spark: SparkSession, parquetPath: String, name: String): DataFrame = {
    val p = java.nio.file.Paths.get(parquetPath)
    val srcPath =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("neardup-src")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
        d.toString
      } else parquetPath
    val schema = spark.read.parquet(srcPath).schema
    val src = spark.readStream.schema(schema).parquet(srcPath)
    val q = candidates(src, "text", "doc_id", shingleN = 3, numHashes = 8, bands = 4)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

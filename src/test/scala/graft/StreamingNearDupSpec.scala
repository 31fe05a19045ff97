package graft

import graft.dedup.Dedup
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._

/** Batch/streaming parity for near-dup candidate generation: the
  * stateful per-bucket incremental join must produce EXACTLY the batch
  * LSH candidate pair set on a bounded corpus (no bucket over cap), and
  * the bucket cap must poison oversize buckets instead of going
  * quadratic.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming LSH candidates == batch lshCandidatePairs on the fixture corpus") {
    val dir = sf("sf0.001")
    val streamed = StreamingNearDup
      .runBounded(spark, s"$dir/documents.parquet", "stream_neardup_spec")
      .select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
    val batch = Dedup
      .lshCandidatePairs(
        Dedup.lshBands(
          Dedup.minhashSignaturesInline(
            graft.core.Tables.documents(spark, dir), "text", "doc_id", 3, 8),
          bands = 4, rowsPerBand = 2),
        maxBucketSize = Some(100))
      .as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"pair sets diverge: streaming-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")
  }

  test("updateBucket: emits new-vs-prior pairs, dedups re-arrivals, poisons over cap") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def state(s: Option[StreamingNearDup.BucketState]) =
      TestGroupState.create(
        org.apache.spark.api.java.Optional.fromNullable(s.orNull),
        GroupStateTimeout.NoTimeout,
        0L, org.apache.spark.api.java.Optional.absent[Long], hasTimedOut = false)
    def rows(ids: Long*) =
      ids.iterator.map(StreamingNearDup.BandRow(0, "k", _))

    // first batch: 3 ids -> all 3 pairs, ascending processing
    val st1 = state(None)
    val out1 = StreamingNearDup.updateBucket(100)((0, "k"), rows(3L, 1L, 2L), st1).toSet
    assert(out1 == Set(
      StreamingNearDup.CandPair(1L, 2L), StreamingNearDup.CandPair(1L, 3L),
      StreamingNearDup.CandPair(2L, 3L)))
    // second batch: one re-arrival (no pairs) + one new (pairs vs all 3)
    val st2 = state(Some(st1.get))
    val out2 = StreamingNearDup.updateBucket(100)((0, "k"), rows(2L, 9L), st2).toSet
    assert(out2 == Set(
      StreamingNearDup.CandPair(1L, 9L), StreamingNearDup.CandPair(2L, 9L),
      StreamingNearDup.CandPair(3L, 9L)))
    // cap 4: the 5th member poisons the bucket; nothing more ever emits
    val st3 = state(Some(st2.get))
    val out3 = StreamingNearDup.updateBucket(4)((0, "k"), rows(50L, 60L), st3).toSet
    assert(out3.isEmpty && st3.get.poisoned)
    val st4 = state(Some(st3.get))
    assert(StreamingNearDup.updateBucket(4)((0, "k"), rows(70L), st4).isEmpty)
  }
}

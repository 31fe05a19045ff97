package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abc")).toDF("doc_id", "text")

  test("asMediaTable: binary payload + typed metadata struct") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema("payload").dataType == BinaryType)
    val metaFields = m.schema("meta").dataType.asInstanceOf[StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val nb = m.select(col("id"), col("meta.n_bytes")).as[(Long, Long)].collect().toMap
    assert(nb(1L) == 11L && nb(2L) == 0L)
  }

  test("extractFeatures: fixed dims, normalized histogram sums to ~1") {
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs, "doc_id", "text"))
    val byId = feats.select(col("id"), col("features")).as[(Long, Seq[Float])]
      .collect().toMap
    assert(byId.values.forall(_.length == 8))
    assert(math.abs(byId(1L).sum - 1.0f) < 1e-5)
    assert(byId(2L).sum == 0.0f) // empty payload -> zero vector
  }

  test("resize: payload truncated/padded to w*h, meta rewritten") {
    val out = Multimodal.resize(Multimodal.asMediaTable(docs, "doc_id", "text"), 4, 3)
    val rows = out.select(col("id"), length(col("payload")), col("meta.width"),
      col("meta.height"), col("meta.n_bytes")).as[(Long, Int, Int, Int, Long)].collect()
    rows.foreach { case (_, len, w, h, nb) =>
      assert(len == 12 && w == 4 && h == 3 && nb == 12L)
    }
  }

  test("sampleFrames: every stride-th fixed-size slice, executor-side") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 3, stride = 2)
    val byId = frames.groupBy(col("id")).count().as[(Long, Long)].collect().toMap
    // doc 1: "hello world" = 11 bytes -> 3 full frames -> idx 0,2 sampled
    assert(byId(1L) == 2L)
    assert(!byId.contains(2L)) // empty payload -> no frames
    val idxs = frames.filter(col("id") === 1).select("frame_idx")
      .as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 2))
  }

  test("decodeStub: deterministic for same bytes") {
    val a = Multimodal.decodeStub("same input".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("same input".getBytes("UTF-8"), 8)
    assert(a.toSeq == b.toSeq)
  }
}

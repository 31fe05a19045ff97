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

  test("perceptualHash64: deterministic, content-sensitive, short payloads dropped") {
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps on running far"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps on running fast"),
      (3L, "completely different content about distributed columnar query engines"),
      (4L, "abc")).toDF("doc_id", "text")
    val m = Multimodal.asMediaTable(fixture, "doc_id", "text")
    val ph = Multimodal.perceptualHash64(m)
      .as[(Long, Long)].collect().toMap
    assert(!ph.contains(4L), "payload shorter than one gram must be absent")
    assert(ph(1L) != ph(3L), "unrelated payloads must not collide")
    val near = java.lang.Long.bitCount(ph(1L) ^ ph(2L))
    val far = java.lang.Long.bitCount(ph(1L) ^ ph(3L))
    assert(near < far, s"one-word edit ($near bits) must sit closer than unrelated ($far)")
    // deterministic across partitionings
    val ph2 = Multimodal.perceptualHash64(
      Multimodal.asMediaTable(fixture.repartition(3), "doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    assert(ph2 == ph)
  }

  test("perceptualHash64: code-point windows on supplementary-plane input (ADVICE r14)") {
    // Independent expected-value twin: windows by CODE POINT (what SQL
    // substring/length count in both engines), built from codePoints —
    // a different boundary mechanism than the kernel's UTF-8 walk.
    def expected(text: String, gram: Int): Long = {
      val basis = Multimodal.dctBasis.sortBy { case (u, i, _) => (u, i) }.map(_._3).toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      val cps = text.codePoints().toArray
      val hist = new Array[Long](64)
      for (p <- 0 to cps.length - gram) {
        val d = md.digest(new String(cps, p, gram).getBytes("UTF-8"))
        var v = 0L
        for (b <- 0 until 8) v = (v << 8) | (d(b) & 0xffL)
        hist(((v >>> 4) % 64).toInt) += 1
      }
      var out = 0L
      for (u <- 0 until 8; v2 <- 0 until 8) {
        var acc = 0L
        for (j <- 0 until 8; i <- 0 until 8)
          acc += basis(u * 8 + i) * hist(i * 8 + j) * basis(v2 * 8 + j)
        if (acc > 0L) out |= (1L << (u * 8 + v2))
      }
      out
    }
    val fixture = Seq(
      // emoji are supplementary-plane: 2 UTF-16 units but ONE code point
      // each — a UTF-16-unit loop would both miscount the windows and
      // split surrogate pairs into invalid gram bytes
      (1L, "café 😀😁 déjà 😂 vu résumé"),
      (2L, "😀😁😂😃"), // exactly 4 code points -> 1 window
      (3L, "😀😁😂")) // 3 code points < gram -> dropped
      .toDF("doc_id", "text")
    val m = Multimodal.asMediaTable(fixture, "doc_id", "text")
    val ph = Multimodal.perceptualHash64(m).as[(Long, Long)].collect().toMap
    assert(!ph.contains(3L),
      "3 code points is shorter than one gram — the length() filter counts code points")
    assert(ph(1L) == expected(fixture.as[(Long, String)].collect().find(_._1 == 1L).get._2, 4))
    assert(ph(2L) == expected("😀😁😂😃", 4))
  }

  test("phashNearDupPairs: banded pair set equals brute force (lossless pigeonhole)") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    val banded = Multimodal.phashNearDupPairs(m, maxHamming = 3, bands = 4)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSet
    val ph = Multimodal.perceptualHash64(m)
    val a = ph.select(col("id").as("id_a"), col("phash").as("pa"))
    val b = ph.select(col("id").as("id_b"), col("phash").as("pb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, "banding must be a pure cost optimization, not an approximation")
    assert(brute.nonEmpty, "fixture should contain at least one perceptual near-dup pair")
  }

  test("decodeStub: deterministic for same bytes") {
    val a = Multimodal.decodeStub("same input".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("same input".getBytes("UTF-8"), 8)
    assert(a.toSeq == b.toSeq)
  }

  /** PNG-encode a w×h image from a row-major array of 0xRRGGBB ints. */
  private def png(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG decode through the mapPartitions seam") {
    // 2×2 image, one solid color per pixel == per grid cell:
    // red, green / blue, white → exact per-cell RGB means
    val bytes = png(2, 2, Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    val media = Seq((1L, bytes), (2L, "not an image".getBytes("UTF-8")), (3L, null))
      .toDF("id", "payload")
      .select(col("id"), col("payload"), struct(
        lit("image/png").as("media_type"), lit(2).as("width"), lit(2).as("height"),
        coalesce(length(col("payload")), lit(0)).cast("long").as("n_bytes")).as("meta"))
    val dec = new Multimodal.ImageIoDecoder(gridW = 2, gridH = 2)
    assert(dec.dims == 12)
    val byId = Multimodal.extractFeaturesWith(media, dec)
      .select(col("id"), col("features")).as[(Long, Seq[Float])].collect().toMap
    assert(byId(1L) == Seq(
      1f, 0f, 0f, // cell (0,0) red
      0f, 1f, 0f, // cell (0,1) green
      0f, 0f, 1f, // cell (1,0) blue
      1f, 1f, 1f)) // cell (1,1) white
    // undecodable and null payloads → zero vector, never a throw
    assert(byId(2L) == Seq.fill(12)(0f))
    assert(byId(3L) == Seq.fill(12)(0f))
  }

  test("ImageIoDecoder: grid cells average multi-pixel regions exactly") {
    // 4×2 image, left half solid red, right half solid blue, grid 2×1:
    // each cell averages 4 pixels of one color
    val bytes = png(4, 2, Array(
      0xff0000, 0xff0000, 0x0000ff, 0x0000ff,
      0xff0000, 0xff0000, 0x0000ff, 0x0000ff))
    val dec = new Multimodal.ImageIoDecoder(gridW = 2, gridH = 1)
    assert(dec.decode(bytes).toSeq == Seq(1f, 0f, 0f, 0f, 0f, 1f))
    // decode is deterministic across calls
    assert(dec.decode(bytes).toSeq == dec.decode(bytes).toSeq)
  }
}

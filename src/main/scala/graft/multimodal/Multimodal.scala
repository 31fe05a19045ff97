package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a per-partition decode /
  * feature-extraction operator.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, null handling. Decoding is a pluggable seam
  * ([[MediaDecoder]]): the DEFAULT is a deterministic byte-histogram
  * stand-in (oracle-checkable, no codec needed), and
  * [[ImageIoDecoder]] is a real JVM codec path (javax.imageio —
  * PNG/BMP/GIF ship in every JRE) proving the seam carries an actual
  * decode. Heavier codecs (javacv, a Python worker via Arrow batches)
  * drop into the same trait; every caller-visible shape stays
  * identical.
  */
object Multimodal {

  /** Pluggable per-payload decoder: bytes → fixed-length feature
    * vector. Implementations MUST be deterministic and total (null /
    * undecodable payloads → zero vector, never throw): executors
    * retry tasks, and a decode that throws on one corrupt blob in a
    * 100 TB scan kills the stage. Instantiated once per partition
    * inside `mapPartitions` — construct expensive codec state lazily
    * in the instance, not per row.
    */
  trait MediaDecoder extends Serializable {
    def dims: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  /** Default decoder: byte-histogram moments (the deterministic fake —
    * no codec dependency, exactly reproducible in the DuckDB oracle).
    */
  final class ByteHistogramDecoder(val dims: Int) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = decodeStub(payload, dims)
  }

  /** Real codec path: javax.imageio (PNG/BMP/GIF/JPEG readers are part
    * of the JRE). Features = per-cell mean RGB over a `gridW × gridH`
    * crop grid, i.e. a tiny deterministic thumbnail embedding —
    * `dims = gridW * gridH * 3`, row-major cells, channels R,G,B in
    * [0,1]. Undecodable or empty payloads yield the zero vector (the
    * corrupt-blob contract above).
    */
  final class ImageIoDecoder(gridW: Int = 2, gridH: Int = 2) extends MediaDecoder {
    val dims: Int = gridW * gridH * 3
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dims)
      if (payload == null || payload.isEmpty) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) return out
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](dims)
      val counts = new Array[Long](gridW * gridH)
      var y = 0
      while (y < h) {
        val cy = math.min(y * gridH / h, gridH - 1)
        var x = 0
        while (x < w) {
          val cx = math.min(x * gridW / w, gridW - 1)
          val cell = cy * gridW + cx
          val rgb = img.getRGB(x, y)
          sums(cell * 3) += (rgb >> 16) & 0xff
          sums(cell * 3 + 1) += (rgb >> 8) & 0xff
          sums(cell * 3 + 2) += rgb & 0xff
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < gridW * gridH) {
        if (counts(c) > 0) {
          var ch = 0
          while (ch < 3) {
            out(c * 3 + ch) = (sums(c * 3 + ch).toDouble / counts(c) / 255.0).toFloat
            ch += 1
          }
        }
        c += 1
      }
      out
    }
  }

  /** Metadata struct carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text/doc table into a media table: payload = utf-8 bytes
    * (the deterministic stand-in for real image bytes), meta derived
    * from the payload. Output: (id, payload binary, meta struct).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/image").as("media_type"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** ===== STUB: deterministic fake decoder =====
    * Real implementation would decode image/audio bytes; here we
    * compute byte-histogram moments so results are stable and testable.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out((payload(i) & 0xff) % dims) += 1.0f
      i += 1
    }
    var d = 0
    while (d < dims) { out(d) = out(d) / payload.length; d += 1 }
    out
  }

  /** ===== STUB: deterministic fake resize =====
    * Real implementation decodes, resizes, re-encodes; the stub
    * truncates/pads the byte payload to `w*h` bytes so output sizes are
    * exactly what a real resize contract promises, and meta is updated.
    */
  private[multimodal] def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload != null) {
      val n = math.min(payload.length, out.length)
      System.arraycopy(payload, 0, out, 0, n)
    }
    out
  }

  /** Resize operator: payload → fixed (w×h) payload, meta rewritten.
    * Pure column expressions over the stub via mapPartitions (same
    * batch shape as decode).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType))))
    media.select(col("id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val p = resizeStub(r.getAs[Array[Byte]]("payload"), w, h)
          Row(r.getAs[Long]("id"), p,
            Row(r.getAs[Row]("meta").getAs[String]("media_type"), w, h, p.length.toLong))
        }
      }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th
    * `frameBytes`-sized slice becomes one frame row (id, frame_idx,
    * frame binary). The explode happens executor-side per partition —
    * no driver involvement, output rows ∝ payload size / stride.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType))))
    media.select(col("id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val p = r.getAs[Array[Byte]]("payload")
          val nFrames = if (p == null) 0 else p.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(r.getAs[Long]("id"), f,
              java.util.Arrays.copyOfRange(p, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }(enc)
  }

  /** Per-partition decode → feature columns. mapPartitions (not a
    * per-row UDF) so a real decoder can amortize codec init per
    * partition/batch — the Scala analogue of `mapInPandas` batch shape.
    * Output: (id, meta, features array<float>).
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame =
    extractFeaturesWith(media, new ByteHistogramDecoder(dims))

  /** [[extractFeatures]] with an explicit [[MediaDecoder]] — the same
    * plan shape whether the decoder is the histogram stub or a real
    * codec ([[ImageIoDecoder]]).
    */
  def extractFeaturesWith(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", mediaMetaType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    media
      .select(col("id"), col("meta"), col("payload"))
      .mapPartitions { rows =>
        // one decoder instance per partition: codec init amortized here
        val d = decoder
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("id"), r.getAs[Row]("meta"),
            d.decode(payload).toSeq)
        }
      }(enc)
  }

  /** Frame-fingerprint near-duplicate pairs — the video/image dedup
    * staple: two media items are near-dups when they SHARE many frame
    * fingerprints (re-encodes, trims, and reposts keep most frames
    * byte-identical even when the container differs). Same idea as
    * content-defined chunking for binaries, applied at frame grain.
    *
    * Pipeline: [[sampleFrames]] (stride 1) → md5 per frame → distinct
    * (id, fingerprint) postings → frequency filter keeping only
    * DISCRIMINATIVE fingerprints (2 ≤ df ≤ maxDf: singletons pair with
    * nothing; ubiquitous frames — black frames, silence, boilerplate —
    * are the stop-shingles of this domain and would otherwise drive a
    * quadratic hot-key join) → fingerprint-keyed self-join → top-k
    * pairs by shared-frame count.
    *
    * Scale shape: the join fans out at most df² ≤ maxDf² pairs per
    * fingerprint — the standard blocked-pair bound, tunable
    * independently of corpus size; everything else is line-rate in the
    * frame count. The postings table is referenced three times (pair
    * join both sides + per-doc frame counts) on one sequential action
    * path → [[graft.core.Caches.cache]].
    *
    * Output: (doc_a, doc_b, shared_frames, overlap_ppm) where
    * overlap_ppm = shared·10⁶ div min(|rare(a)|, |rare(b)|) — exact
    * integer containment of the rarer side; top-k by (shared DESC,
    * doc_a, doc_b) — a rank-based cut, non-vacuous on any corpus.
    */
  def frameNearDupPairs(
      media: DataFrame,
      frameBytes: Int,
      maxDf: Int,
      k: Int): DataFrame = {
    // 60-bit integer fingerprints (15 hex chars of the md5 — the q85
    // convention): the fp is the JOIN/GROUP key of every downstream
    // exchange, and 8-byte longs vs 32-byte hex strings halve the
    // probe's shuffle bytes at 500k docs (see DESIGN.md).
    val postings = graft.core.Caches.cache(
      sampleFrames(media, frameBytes, stride = 1)
        .select(
          col("id"),
          // native Md5Prefix60 (binary form): same first-15-hex-chars
          // value as the conv(substring(md5(...))) chain the oracle
          // runs, without the per-frame hex-string round trip
          org.apache.spark.sql.graft.VectorExpressions
            .md5Prefix60(col("frame")).as("fp"))
        .distinct())

    val discriminative = postings
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    // Eager: `rare` feeds the pair join (both sides) AND two per-doc
    // count broadcasts — concurrent broadcast builds race past a lazy
    // cache (q227 rule), so materialize here.
    val rare = postings.join(discriminative, "fp").localCheckpoint(true)

    val perDoc = rare.groupBy(col("id")).agg(count(lit(1)).as("n_rare"))

    val a = rare.select(col("fp"), col("id").as("doc_a"))
    val b = rare.select(col("fp"), col("id").as("doc_b"))
    // Rank-and-cut BEFORE attaching per-doc counts: overlap_ppm isn't
    // in the rank key, so the cut is identical, and the count join then
    // runs k-rows-broadcast against a line-rate perDoc scan — perDoc is
    // corpus-row-sized, never the broadcast side at scale.
    val top = a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .orderBy(col("shared_frames").desc, col("doc_a"), col("doc_b"))
      .limit(k)
    broadcast(
      broadcast(top)
        .join(perDoc.select(col("id").as("doc_a"), col("n_rare").as("na")), "doc_a"))
      .join(perDoc.select(col("id").as("doc_b"), col("n_rare").as("nb")), "doc_b")
      .select(
        col("doc_a"),
        col("doc_b"),
        col("shared_frames"),
        expr("shared_frames * 1000000 div least(na, nb)").as("overlap_ppm"))
      .orderBy(col("shared_frames").desc, col("doc_a"), col("doc_b"))
  }

  /** Integer-quantized DCT-II basis, `C[u][i] = round(2^14·cos((2i+1)uπ/16))`
    * — operator constants (not data-derived), shared verbatim with the
    * DuckDB twin as a VALUES literal (the LSH planes-as-literals rule).
    */
  val dctBasis: Seq[(Int, Int, Long)] =
    for { u <- 0 until 8; i <- 0 until 8 }
      yield (u, i, Math.round(16384.0 * math.cos((2 * i + 1) * u * math.Pi / 16)))

  /** Perceptual hash (pHash-style, integer-exact): 64-bit signature
    * per media item = the SIGN BITS of an 8×8 integer DCT over a
    * 64-bin hashed-4-gram histogram of the payload.
    *
    * Why hashed 4-grams and not the raw byte histogram: letter
    * frequencies are language constants, so a byte-frequency grid
    * makes every English payload collide into a near-clique; md5
    * spreads content n-grams uniformly over the 64 cells, so
    * UNRELATED payloads get independent DCT signs (Hamming ≈ 32)
    * while near-dups (mostly-shared content → mostly-equal
    * histograms) stay within a few bits. All arithmetic is exact
    * int64 — histogram counts × the quantized [[dctBasis]] — so the
    * DuckDB twin lands on the identical 64 bits.
    *
    * Scale shape: gram fanout is payload-length rows (the shingle
    * cost every content fingerprint here pays), collapsed to ≤ 64
    * cells per id by a count agg before the two 8×-fanout broadcast
    * basis joins; everything after the histogram is line-rate in
    * (id × 64). Payloads shorter than 4 bytes have no grams and are
    * absent from the output (same condition in the twin).
    */
  def perceptualHash64(media: DataFrame): DataFrame = {
    // flat basis C[u*8+i] for the kernel (same literals the oracle
    // embeds as VALUES)
    val basis = dctBasis.sortBy { case (u, i, _) => (u, i) }.map(_._3).toIndexedSeq
    media
      .select(col("id"), col("payload").cast("string").as("t"))
      // explicit short-payload filter: the DuckDB twin's
      // generate_series(1, 0) is empty, so payloads shorter than one
      // gram are absent from its output (the kernel is total and would
      // emit the all-zero-histogram hash)
      .filter(length(col("t")) >= 4)
      // whole hash in ONE scan-rate kernel (PHash64: md5-gram
      // histogram + exact-integer DCT + sign packing) -- the earlier
      // DataFrame matrix-multiply form shuffled doc-x-64-grain frames
      // through two agg exchanges (~4 GB at 500k docs); this is
      // zero-exchange and bit-identical to the twin's composed SQL
      .select(col("id"),
        org.apache.spark.sql.graft.VectorExpressions.phash64(
          col("t"), gram = 4, basis).as("phash"))
  }

  /** pHash near-dup pairs with LOSSLESS Hamming banding (the q49
    * SimHash rule lifted to 64 bits): split the hash into `bands`
    * exact-match bands; a pair within Hamming ≤ bands−1 must collide
    * on ≥ 1 band (pigeonhole), so the banded result EQUALS brute
    * force — which is exactly what the oracle computes. One integer
    * bit_count(xor) verifies each candidate.
    */
  def phashNearDupPairs(
      media: DataFrame,
      maxHamming: Int,
      bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "full recall needs maxHamming <= bands - 1")
    require(64 % bands == 0, "bands must divide 64")
    val bitsPerBand = 64 / bands
    // EAGER materialization, not a lazy cache: the downstream self-joins'
    // shuffle-map stages are independent and scheduled concurrently, so
    // they race past an unmaterialized cache and re-run the whole hash
    // pipeline (the q227 fan-out rule — measured 43.5 s doubled vs
    // single-run at sf0.1). The frame is doc-grain (id, phash) — 16
    // bytes per doc.
    val hashes = perceptualHash64(media).localCheckpoint(true)
    // Band over DISTINCT hash VALUES, not documents: duplicate-heavy
    // corpora put whole exact-dup cliques into every band bucket and
    // the doc-grain self-join inflates quadratically per bucket
    // (measured 4.3 GB shuffle / 179 s at 500k docs with 100-member
    // cliques). Distinct-hash banding bounds the candidate grain by
    // the hash-value count; member expansion afterwards is
    // output-proportional by construction.
    val distinctHashes = hashes.select(col("phash")).distinct().localCheckpoint(true)
    val banded = distinctHashes.select(
      col("phash"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band_idx"),
          shiftright(col("phash"), b * bitsPerBand)
            .bitwiseAND(lit(if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1))
            .as("band_val"))
      }: _*)).as("band"))
      .select(col("phash"), col("band.band_idx"), col("band.band_val"))
    val a = banded.select(col("band_idx"), col("band_val"), col("phash").as("ph_a"))
    val b = banded.select(col("band_idx"), col("band_val"), col("phash").as("ph_b"))
    // row-local pair dedup (the r10 min-shared-cell rule): a hash pair
    // colliding on k bands appears k times; keep the copy whose
    // band_idx is the FIRST band where the two hashes agree — a pure
    // function of (ph_a, ph_b), so no pair-grain distinct() exchange
    val firstSharedBand = (0 until bands)
      .map { bi =>
        val bv = (ph: Column) =>
          shiftright(ph, bi * bitsPerBand)
            .bitwiseAND(lit(if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1))
        (bv(col("ph_a")) === bv(col("ph_b")), lit(bi))
      }
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(-1))) {
        case (acc, (cond, idx)) => acc.when(cond, idx)
      }
      .otherwise(lit(-1))
    val hashPairs = a.join(b, Seq("band_idx", "band_val"))
      .filter(col("ph_a") < col("ph_b"))
      .filter(col("band_idx") === firstSharedBand)
      .select(col("ph_a"), col("ph_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // member expansion: distinct-hash pairs × their members (pair
    // normalized to id_a < id_b), plus the Hamming-0 cliques (all id
    // pairs sharing one hash). Both joins are keyed on phash —
    // doc-grain exchanges; the output grain is the result itself.
    val crossPairs = hashPairs
      .join(hashes.select(col("phash").as("ph_a"), col("id").as("m_a")), Seq("ph_a"))
      .join(hashes.select(col("phash").as("ph_b"), col("id").as("m_b")), Seq("ph_b"))
      .select(
        least(col("m_a"), col("m_b")).as("id_a"),
        greatest(col("m_a"), col("m_b")).as("id_b"),
        col("hamming"))
    val cliquePairs = hashes.select(col("phash"), col("id").as("id_a"))
      .join(hashes.select(col("phash"), col("id").as("id_b")), Seq("phash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    crossPairs.unionByName(cliquePairs)
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a per-partition decode /
  * feature-extraction operator.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, null handling. The actual media decode is STUBBED with
  * a deterministic fake (this container ships no image/audio codecs):
  * `fakeDecodeFeatures` derives a fixed-length feature vector from the
  * bytes themselves (byte histogram moments). Swap `decodeStub` for a
  * real codec (e.g. javacv / a Pandas-UDF python worker) in production;
  * every caller-visible shape stays identical.
  */
object Multimodal {

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
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", mediaMetaType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    media
      .select(col("id"), col("meta"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init point for a real codec
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("id"), r.getAs[Row]("meta"),
            decodeStub(payload, dims).toSeq)
        }
      }(enc)
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling-hash fingerprints of ALL `windowLen`-byte
  * windows of a string, stride 1, in ONE O(n) pass — the petabyte-scan
  * sibling of the md5-per-window formulation in
  * `Dedup.maximalRepeatRanges` (which is O(L) work per position and is
  * kept where the DuckDB oracle must reproduce the fingerprints
  * bit-for-bit; this expression is engine-internal).
  *
  * fp(i) = Σ_{j<L} b[i+j]·B^(L−1−j) mod 2^64 with B the FNV-64 prime —
  * rolled as h·B − b[i]·B^L + b[i+L], so each position costs two
  * multiplies regardless of L. Equal windows ⇒ equal fingerprints;
  * unequal windows collide with p ≈ m²/2^65 corpus-wide (same class of
  * accepted risk as the 16-hex-char md5 keys elsewhere; a collision
  * can only ADD a spurious duplicate range). Byte-level windows over
  * UTF-8: for ASCII corpora identical to character windows; multi-byte
  * offsets are byte offsets (documented at the call site).
  */
case class RollingWindowFps(child: Expression, windowLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(windowLen >= 1, s"window length must be >= 1, got $windowLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_fps"

  private val B = 1099511628211L // FNV-64 prime
  // B^windowLen mod 2^64, precomputed once per expression instance
  private lazy val bPowL: Long = {
    var p = 1L
    var i = 0
    while (i < windowLen) { p *= B; i += 1 }
    p
  }

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def fps(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    val count = n - windowLen + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count)
    var h = 0L
    var j = 0
    while (j < windowLen) { h = h * B + (bytes(j) & 0xffL); j += 1 }
    out(0) = h
    var i = 1
    while (i < count) {
      h = h * B - (bytes(i - 1) & 0xffL) * bPowL + (bytes(i + windowLen - 1) & 0xffL)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingFps", this, classOf[RollingWindowFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fps($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowFps =
    copy(child = newChild)
}

object RollingWindowFps {
  def apply(text: Column, windowLen: Int): Column =
    ExpressionUtils.column(RollingWindowFps(ExpressionUtils.expression(text), windowLen))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array in ONE pass: for each of
  * `numHashes` salted md5 families, the lexicographic-min hex digest.
  *
  * Semantically identical to
  * `array(array_min(transform(sh, s -> md5(concat('s0|', s)))), ...)` —
  * the same bytes reach the same md5 — but evaluated as a tight loop
  * with a reused MessageDigest instead of `numHashes` interpreted
  * higher-order-function lanes each traversing the array with
  * per-element expression dispatch (measured ~6× on the dedup path).
  *
  * Codegen: generated code calls [[sign]] on a referenced copy of this
  * expression, so the md5 loop stays a compiled JVM method and the
  * enclosing project stays inside one WholeStageCodegen span (the prior
  * CodegenFallback forced a row-materialization boundary mid-scan).
  * The MessageDigest is thread-local: one instance per executor task
  * thread instead of one allocation per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"s$i|".getBytes("UTF-8"))
  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-row kernel, shared verbatim by interpreted eval and codegen. */
  def sign(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    val md = localMd.get()
    val hexChars = MinHashSignature.hexChars
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val shingle = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(salts(i))
          md.update(shingle)
          val digest = md.digest()
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(2 * b) = hexChars((digest(b) >> 4) & 0xf)
            hex(2 * b + 1) = hexChars(digest(b) & 0xf)
            b += 1
          }
          val s = new String(hex)
          if (mins(i) == null || s < mins(i)) mins(i) = s
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  override def nullSafeEval(input: Any): Any =
    sign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sign($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  private[graft] val hexChars = "0123456789abcdef".toCharArray

  def apply(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingles), numHashes))
}

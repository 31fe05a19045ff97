package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Winnowing fingerprint selection in ONE pass: hash each positional
  * shingle to the top 60 bits of its md5 (== DuckDB
  * `CAST('0x' || substring(md5(s),1,15) AS BIGINT)`), slide a
  * `w`-window over the hash sequence with a monotonic deque, and return
  * the DISTINCT window minima in first-occurrence order.
  *
  * Semantically identical to the composed-HOF form
  * `array_distinct(transform(sequence(0, size(hs)-w), i ->
  * array_min(slice(hs, i+1, w))))` over
  * `hs = transform(shingles, s -> conv(substring(md5(s),1,15),16,10))`
  * — but those higher-order functions are CodegenFallback, and an
  * `explode` whose generator input is a collapsed CodegenFallback
  * expression re-evaluates the whole subtree per OUTPUT element
  * (measured 17.8 s vs 1.3 s on the sf0.1 corpus for q134's postings
  * explode). As a codegen-able kernel the selection runs once per row
  * inside the scan's WholeStageCodegen span: O(len) deque instead of
  * O(len·w) slice copies, no hex-string round-trip per element, and no
  * cache materialization needed to break the collapse.
  *
  * Fewer than `w` shingles → empty array (no full window exists).
  */
case class WinnowedFps(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_fps"

  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-row kernel, shared verbatim by interpreted eval and codegen. */
  def winnow(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < w) return WinnowedFps.empty
    val md = localMd.get()
    val h = new Array[Long](n)
    var j = 0
    while (j < n) {
      // null shingles cannot occur (WordShingles emits non-null); guard
      // with the md5 of the empty string for total-function safety
      md.reset()
      if (!arr.isNullAt(j)) md.update(arr.getUTF8String(j).getBytes)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(j) = v >>> 4 // top 60 bits == first 15 hex chars base-16
      j += 1
    }
    // monotonic ascending deque of indices; head = argmin of the window
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(h(deque(head)))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { res(k) = it.next(); k += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowedFps", this, classOf[WinnowedFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFps =
    copy(child = newChild)
}

object WinnowedFps {
  private val empty = new GenericArrayData(new Array[Long](0))

  def apply(shingles: Column, w: Int): Column =
    ExpressionUtils.column(
      WinnowedFps(ExpressionUtils.expression(shingles), w))
}

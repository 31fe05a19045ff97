package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Z-order (Morton) interleaving of two long keys' low `bits` bits.
  *
  * `z = Σ_i ((x>>i)&1) << 2i  |  ((y>>i)&1) << 2i+1` — a space-filling
  * curve value: rows close in BOTH dimensions get close z-values, so a
  * range-clustered write on `z` ([[graft.core.Sinks.writeZOrderedParquet]])
  * yields parquet files whose min/max statistics are narrow in both
  * dimensions at once. A single-key sort gives file skipping on one
  * column and destroys it on the other; the curve shares the skipping
  * power across both — the standard layout for "filtered by customer
  * AND by date" fact tables.
  *
  * Inputs are masked to their low `bits` bits (the curve cell), so any
  * long is valid; negative inputs take their two's-complement low bits
  * — callers should offset genuinely negative domains first. Pure bit
  * arithmetic: bit-identical on any engine, so the z-value itself is
  * oracle-checkable (the SQL mirror is the unrolled shift-mask sum).
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Long]
    val y = r.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): ZOrder2 = copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def apply(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(
      ZOrder2(ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for quantized-vector arithmetic (lives
  * in an `org.apache.spark.sql` subpackage because the Column↔
  * Expression bridge and `AbstractDataType` are `private[sql]`).
  *
  * `aggregate`/`zip_with` (the portable formulations in
  * graft.similarity) are higher-order functions Spark evaluates
  * interpreted — per element, with closure dispatch — and they block
  * whole-stage codegen of the surrounding stage. [[LongVectorDot]]
  * computes the same integer dot product as one fused loop with
  * `doGenCode`, keeping scan→score→top-k in a single codegen stage.
  * Same inputs, bit-identical outputs; only the execution strategy
  * differs (build-brief preference (b): native Expression over UDF).
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance gather: Σ_j lut[j·ksub + codes[j]] — the ADC
  * inner loop of product-quantized similarity scan (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"). `codes` is a
  * vector's m sub-quantizer cell ids; `lut` is one query's flattened
  * m×ksub table of per-cell score parts. One fused codegen loop per
  * (query, vector) pair keeps the compressed-corpus scan — the whole
  * point of PQ at scale — inside the scan stage's codegen span.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var j = 0
    while (j < m) { acc += lut.getLong(j * ksub + codes.getLong(j).toInt); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |long $acc = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getLong($j * $ksub + (int) $codes.getLong($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def longVectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Σ x_i² without reading the array twice. */
  def longVectorNorm2(a: Column): Column = longVectorDot(a, a)

  def pqAdcScore(codes: Column, lut: Column, ksub: Int): Column =
    ExpressionUtils.column(
      PqAdcScore(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), ksub))
}

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

object VectorExpressions {
  def longVectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Σ x_i² without reading the array twice. */
  def longVectorNorm2(a: Column): Column = longVectorDot(a, a)
}

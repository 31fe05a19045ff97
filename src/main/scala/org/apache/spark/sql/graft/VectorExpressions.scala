package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, TypeCollection}

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

/** Fused embedding quantizer: array<float|double> → array<long> of
  * `round(x·10⁴)` (HALF_UP, bit-identical to the composed
  * `transform(emb, x -> round(cast(x as double) * 10000) cast long)` —
  * `java.math.BigDecimal.valueOf(...).setScale(0, HALF_UP)` is exactly
  * Spark's `Round` double path). Exists because the HOF form is a
  * CodegenFallback: a `posexplode` whose generator input is a
  * collapsed interpreted HOF re-evaluates the whole transform per
  * OUTPUT element — O(dim²) interpreted work per row (the q134
  * pathology; measured 5.3 s → 134.6 s on 100k → 1M vectors for
  * label centroids). One codegen'd kernel call per row restores O(dim)
  * and keeps the scan's codegen span intact.
  */
case class FloatVectorQuantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "float_vector_quantize"

  // resolved lazily: child.dataType is not bound at construction
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-row kernel, also called from generated code via reference obj.
    * Null ELEMENTS fail loud (suite convention): the output type declares
    * containsNull=false, and silently quantizing a null slot to 0 — what
    * getFloat on a null entry would do — would corrupt downstream vector
    * math invisibly. The HOF form this kernel replaced propagated null
    * elements; no caller feeds nullable slots, so loud is the safe seam.
    */
  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"float_vector_quantize: null element at index $i of $n — " +
            "embedding vectors must be dense (containsNull=false output)")
      }
      val d = (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) * 10000.0
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizer", this,
      classOf[FloatVectorQuantize].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FloatVectorQuantize = copy(child = newChild)
}

/** max(|x_i|) over an array<long> — the per-vector quantization scale
  * lookup of the int8 audit (q266). One fused codegen loop; the
  * `array_max(transform(abs))` HOF form is interpreted per element and
  * would break the scan's codegen span. Empty arrays yield 0.
  */
case class LongVectorAbsMax(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_abs_max"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0L
    var i = 0
    while (i < n) { val v = math.abs(x.getLong(i)); if (v > m) m = v; i += 1 }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |long $m = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = Math.abs($x.getLong($i));
         |  if ($v > $m) $m = $v;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LongVectorAbsMax = copy(child = newChild)
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

  def floatVectorQuantize(a: Column): Column =
    ExpressionUtils.column(FloatVectorQuantize(ExpressionUtils.expression(a)))

  def longVectorAbsMax(a: Column): Column =
    ExpressionUtils.column(LongVectorAbsMax(ExpressionUtils.expression(a)))
}

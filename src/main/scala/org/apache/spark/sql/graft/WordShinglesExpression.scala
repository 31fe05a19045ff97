package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column in ONE pass.
  *
  * Semantically identical to the composed form
  * `filter(transform(sequence(0, greatest(size(ts)-n, 0)), i ->
  * when(i+n <= size(ts), concat_ws(" ", slice(ts, i+1, n)))), notNull)`
  * with `ts = split(trim(text), "\s+")` — same trim (ASCII space), same
  * Java-regex tokenization, same single-space joining — but the
  * composed form re-evaluates its subtree per OUTPUT ELEMENT through
  * interpreted higher-order-function dispatch (the `split` alone runs
  * ~numShingles times per row), which measured ~5 s for 5 000 docs at
  * sf0.1. Here: one split, one StringBuilder sweep per row (~20×).
  *
  * Codegen: the generated code calls [[shingle]] on a referenced copy
  * of this expression (the built-in StaticInvoke/RegExp* pattern) — the
  * per-row loop stays a compiled JVM method AND the enclosing project
  * stays inside one WholeStageCodegen span, instead of the
  * CodegenFallback path that forces an InternalRow materialization
  * boundary in the middle of the scan stage.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Per-row kernel, shared verbatim by interpreted eval and codegen. */
  def shingle(input: UTF8String): ArrayData = {
    // trim ASCII spaces only — same as Spark's trim()
    val s = input.trim().toString
    // limit -1: identical to Spark's split(str, regex) semantics
    val toks = ws.split(s, -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingle($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local repetition statistics of a text column in ONE pass:
  * `struct(n_tokens, n_distinct_tokens, top_ngram_count)` — token
  * count, distinct-token count, and the occurrence count of the most
  * frequent word n-gram.
  *
  * Semantics match the relational formulation exactly (whitespace
  * split of `trim(text)` — the same tokenization as [[WordShingles]] —
  * then per-n-gram counts and a max), but the relational form explodes
  * every n-gram into a row and SHUFFLES the whole corpus's n-grams to a
  * (doc, ngram) aggregation. Per-document statistics never need to
  * leave the row: this expression keeps the entire computation
  * scan-side (zero exchanges in the q59 plan below the final display
  * sort), which is the difference between a metadata pass and a
  * corpus-wide shuffle at 100 TB. CodegenFallback for the same reason
  * as [[WordShingles]]: the per-row loop is already a tight JVM loop.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("top_ngram_count", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].trim().toString
    val toks = ws.split(s, -1)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { distinct.add(toks(i)); i += 1 }
    val grams = new java.util.HashMap[String, Long]()
    var top = 0L
    i = 0
    val count = toks.length - n + 1
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val k = sb.toString
      val c = grams.merge(k, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(toks.length.toLong, distinct.size.toLong, top)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text), n))
}

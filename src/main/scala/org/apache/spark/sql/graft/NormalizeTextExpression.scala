package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column.
  *
  * Canonical composition (NFC) is the standard first step of a text
  * cleaning pipeline: the same visible text can arrive as precomposed
  * code points (U+00E9) or base + combining mark (U+0065 U+0301), and
  * every downstream exact operator — fingerprint dedup, shingle
  * Jaccard, token counting — silently treats the two as different
  * documents unless the corpus is normalized first. Spark ships no
  * normalization function, so this is a native expression over
  * `java.text.Normalizer` (JDK, no extra dependency).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that avoids
  * allocating for the (overwhelmingly common) already-NFC input; only
  * rows that actually carry decomposed sequences pay for composition.
  * CodegenFallback: the JDK call dominates; a codegen shell would just
  * wrap it.
  */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  def apply(text: Column): Column =
    ExpressionUtils.column(NormalizeNfc(ExpressionUtils.expression(text)))
}

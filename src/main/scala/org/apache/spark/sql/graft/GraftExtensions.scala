package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension wiring for the engine's native expressions:
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (or [[GraftFunctions.register]] on a live session) makes them
  * available to SQL: `SELECT long_vector_dot(a, b) FROM t`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => BandJoinStrategy)
  }
}

object GraftFunctions {
  type FunctionDef =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val definitions: Seq[FunctionDef] = Seq(
    (
      FunctionIdentifier("long_vector_dot"),
      new ExpressionInfo(
        classOf[LongVectorDot].getCanonicalName,
        "long_vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_vector_dot expects 2 arguments")
        LongVectorDot(children.head, children(1))
      }),
    (
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(
        classOf[WordShingles].getCanonicalName,
        "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles expects (text, n)")
        WordShingles(children.head, intLiteral(children(1), "shingle size"))
      }),
    (
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(
        classOf[RepetitionStats].getCanonicalName,
        "repetition_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "repetition_stats expects (text, n)")
        RepetitionStats(children.head, intLiteral(children(1), "ngram size"))
      }),
    (
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(
        classOf[MinHashSignature].getCanonicalName,
        "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_signature expects (shingles, numHashes)")
        MinHashSignature(children.head, intLiteral(children(1), "numHashes"))
      }))

  /** Register into an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

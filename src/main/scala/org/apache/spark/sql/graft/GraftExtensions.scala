package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring for the engine's native expressions:
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (or [[GraftFunctions.register]] on a live session) makes them
  * available to SQL: `SELECT long_vector_dot(a, b) FROM t`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach(ext.injectFunction)
}

object GraftFunctions {
  type FunctionDef =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val definitions: Seq[FunctionDef] = Seq(
    (
      FunctionIdentifier("long_vector_dot"),
      new ExpressionInfo(
        classOf[LongVectorDot].getCanonicalName,
        "long_vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_vector_dot expects 2 arguments")
        LongVectorDot(children.head, children(1))
      }))

  /** Register into an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

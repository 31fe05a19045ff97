package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's internal bloom-filter expressions (the
  * same pair Catalyst's `InjectRuntimeFilter` rule uses for runtime
  * row-level join pruning). Exposed here as library surface so
  * operators can build an EXPLICIT semi-join prefilter: aggregate a
  * compact mergeable sketch over the build side (map-side partials,
  * one tiny binary out), then probe scan-side with a codegen'd
  * membership test — the pattern that replaces "broadcast the whole
  * build-side key set" once that set stops fitting in a broadcast.
  *
  * Both expressions operate on 64-bit hashes; feed them
  * `functions.xxhash64(...)` of the key.
  */
object BloomFunctions {

  /** Aggregate a bloom filter over a LongType hash column. Mergeable:
    * partial filters are OR-ed map-side, so the shuffle carries one
    * `numBits/8`-byte buffer per partition regardless of row count.
    */
  def bloomFilterAgg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        ExpressionUtils.expression(hash),
        Literal(estimatedItems),
        Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized bloom filter embedded as a
    * literal (the expression requires a constant or scalar subquery —
    * a driver-collected sketch is exactly that). May return false
    * positives, NEVER false negatives.
    */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        ExpressionUtils.expression(hash)))
}

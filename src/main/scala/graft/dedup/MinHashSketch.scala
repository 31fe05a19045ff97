package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch as a typed [[Aggregator]]: element-wise
  * minimum of per-row signatures. Because min is commutative/
  * associative/idempotent, `merge` implements SET UNION of the
  * underlying shingle sets — the sketch of a group equals the sketch
  * of the union of its members' shingles, computed with map-side
  * partial aggregation (each shuffle partial is one fixed-width array,
  * not the rows).
  *
  * This is the sketch-merge shape SURVEY.md §4/§7 anticipates for
  * custom aggregation (a TypedImperativeAggregate equivalent at the
  * Dataset API level): use it to maintain per-user / per-domain /
  * per-shard near-dup signatures incrementally, then band the merged
  * sketches with [[Dedup.lshBands]].
  */
class MinHashSketchAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  override def zero: Array[String] = Array.fill(numHashes)(null)

  private def mergeInto(acc: Array[String], sig: Seq[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      val v = if (i < sig.length) sig(i) else null
      if (acc(i) == null || (v != null && v < acc(i))) acc(i) = v
      i += 1
    }
    acc
  }

  override def reduce(acc: Array[String], row: Seq[String]): Array[String] =
    mergeInto(acc, row)

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    mergeInto(a, b.toSeq)

  override def finish(acc: Array[String]): Seq[String] = acc.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MinHashSketch {

  /** Column form: `df.groupBy(g).agg(MinHashSketch.merge(8)(col("sig")))`
    * merges per-row signatures (e.g. from
    * [[Dedup.minhashSignaturesInline]]) into one group sketch.
    */
  def merge(numHashes: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val agg = new MinHashSketchAggregator(numHashes)
    import org.apache.spark.sql.functions.udaf
    val fn = udaf(agg, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]())
    c => fn(c)
  }
}

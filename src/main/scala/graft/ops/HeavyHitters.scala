package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch as a typed mergeable
  * [[Aggregator]]: at most `k` counters per group, updated in one
  * pass, partials merged map-side (the Agarwal et al. mergeable-
  * summaries merge: sum counters, then subtract the (k+1)-th largest
  * count and drop non-positives — the error bound adds across merges).
  *
  * Guarantees (partitioning- and order-INDEPENDENT, the part a
  * pipeline may rely on):
  *  - every item with true frequency > n/(k+1) is present in the
  *    sketch (n = group's total count);
  *  - estimates never exceed the true count, and undercount by at
  *    most n/(k+1).
  * The EXACT counter values depend on encounter order (inherent to
  * MG), so this surface is spec-verified by its bounds, like the HLL
  * family — never hash-compared against an oracle.
  *
  * Why it matters at 100 TB: exact per-key top-k first materializes
  * ALL distinct (key, item) counts — the co-visitation shuffle is the
  * full pair table, the very thing that grows super-linearly with
  * traffic. The sketch caps shuffle at k counters per key, turning
  * "top co-items per item" into a bounded-state aggregation
  * (DESIGN.md "what changes first beyond 100 TB" #2).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(acc: Map[Long, Long], item: Long): Map[Long, Long] =
    acc.get(item) match {
      case Some(c)               => acc.updated(item, c + 1L)
      case None if acc.size < k  => acc.updated(item, 1L)
      case None                  =>
        // decrement-all; zeros drop out
        acc.collect { case (i, c) if c > 1L => (i, c - 1L) }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val summed = b.foldLeft(a) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count; ≤ k entries stay positive
      val kth = summed.values.toArray.sortBy(-_).apply(k)
      summed.collect { case (i, c) if c > kth => (i, c - kth) }
    }
  }

  override def finish(acc: Map[Long, Long]): Map[Long, Long] = acc

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

object HeavyHitters {

  /** Column form: `df.groupBy(g).agg(HeavyHitters.sketch(k)(col("item")))`. */
  def sketch(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesAggregator(k), ExpressionEncoder[Long]())
    c => fn(c)
  }

  /** Approximate top co-items per item over a (group, item) stream:
    * enumerate in-group pairs row-locally (both directions), sketch
    * the co-item stream per anchor with MG(k), explode the sketch.
    * Output: (item, co_item, est_count, n_pairs) — `n_pairs` is the
    * anchor's total co-occurrence count, so the MG bound
    * `true − est ≤ n_pairs/(k+1)` is checkable per row.
    *
    * The shuffle carries ≤ k counters per anchor (map-side partials)
    * instead of the full distinct (item_a, item_b) pair table — the
    * bounded-state form of [[Joins.covisitationPairsDistinct]].
    */
  def approxTopCoitems(
      distinctItems: DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int,
      maxGroupSize: Option[Int] = Some(200)): DataFrame = {
    val grouped = distinctItems
      .groupBy(col(groupCol))
      .agg(collect_set(col(itemCol)).as("items"))
    val capped = maxGroupSize match {
      case Some(cap) => grouped.filter(size(col("items")) <= cap)
      case None      => grouped
    }
    val pairs = capped
      .select(explode(col("items")).as("item"), col("items"))
      .select(col("item"), explode(col("items")).as("co_item"))
      .filter(col("item") =!= col("co_item"))
    pairs
      .groupBy(col("item"))
      .agg(
        sketch(k)(col("co_item")).as("sk"),
        count(lit(1)).as("n_pairs"))
      .select(
        col("item"),
        explode(col("sk")).as(Seq("co_item", "est_count")),
        col("n_pairs"))
      .select(col("item"), col("co_item"), col("est_count"), col("n_pairs"))
  }
}

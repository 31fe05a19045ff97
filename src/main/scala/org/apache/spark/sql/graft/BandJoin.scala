package org.apache.spark.sql.graft

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

import scala.jdk.CollectionConverters._

/** Logical band join: one output row per (l, r) pair with
  * `|leftKey(l) − rightKey(r)| ≤ epsilon` (inclusive; null keys never
  * match, mirroring SQL BETWEEN). The rung-3 extension-ladder operator
  * (LogicalPlan + SparkStrategy + SparkPlan): Catalyst plans a pure
  * band predicate as BroadcastNestedLoop/cartesian + filter — O(|L|·|R|)
  * comparisons — because neither side offers an equi-key. The physical
  * plan below is a range-partitioned sweep-merge: sample → shared range
  * bounds → replicate only boundary-straddling right rows → per-
  * partition sorted sweep, O((|L|+|R|)·log + output) work and one
  * shuffle of each side, no quadratic compare. Semantics mirror the
  * reference's window-predicate joins (time-windowed co-occurrence,
  * `prepare_training_data_pyspark.py:236-240`) generalized to an
  * explicit ±ε contract.
  */
case class BandJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    epsilon: Long)
  extends BinaryNode {
  require(epsilon >= 0, s"epsilon must be non-negative, got $epsilon")
  override def output: Seq[Attribute] = left.output ++ right.output
  override def maxRows: Option[Long] = None
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[BandJoinPlan]] → [[BandJoinExec]].
  * Injected by [[GraftExtensions]] (config path) and lazily by
  * [[BandJoin.apply]] (programmatic path).
  */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(l, r, lk, rk, eps) =>
      BandJoinExec(planLater(l), planLater(r), lk, rk, eps) :: Nil
    case _ => Nil
  }
}

/** Range-partitioned sweep-merge band join.
  *
  * Physical algorithm:
  *  1. Deterministically reservoir-sample left keys per partition
  *     (seed = partition index) and cut `spark.sql.shuffle.partitions`
  *     range bounds — the left side's key distribution sizes the
  *     partitions, so skewed timelines still balance.
  *  2. Shuffle: each LEFT row goes to exactly the partition owning its
  *     key; each RIGHT row is replicated to every partition whose range
  *     intersects `[k−ε, k+ε]` (normally 1, 2 only within ε of a cut —
  *     the replication factor is 1 + ε/partition-width, not 2×).
  *  3. Within each partition, rows arrive sorted by key (sort-shuffle);
  *     a single forward sweep keeps a deque per side holding rows with
  *     key ≥ current−ε and emits each qualifying pair exactly once —
  *     a pair is emitted only in the (unique) partition owning the left
  *     row.
  *
  * Memory: the two deques hold only rows within one ε-window of the
  * sweep line — bounded by band density, not partition size. Work is
  * O((|L|+|R|) log + |output|); the quadratic blow-up of the built-in
  * nested-loop plan never materializes.
  */
case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    epsilon: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  /** Owner partition of key `k` given ascending cut points: first i with
    * k ≤ bounds(i), else bounds.length.
    */
  private def owner(bounds: Array[Long], k: Long): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (k <= bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val eps = epsilon
    val targetParts = conf.numShufflePartitions
    val lOut = left.output
    val rOut = right.output
    val lKeyBound = BindReferences.bindReference(leftKey, lOut)
    val rKeyBound = BindReferences.bindReference(rightKey, rOut)

    val leftRdd = left.execute()
    val rightRdd = right.execute()

    // 1. bounds from a deterministic per-partition reservoir of left keys
    val sampled: Array[Long] = leftRdd
      .mapPartitionsWithIndex { (idx, it) =>
        val rnd = new java.util.Random(0x9E3779B97F4A7C15L ^ idx)
        val reservoir = new Array[Long](128)
        var seen = 0L
        var filled = 0
        it.foreach { row =>
          val v = lKeyBound.eval(row)
          if (v != null) {
            val k = v.asInstanceOf[Long]
            if (filled < reservoir.length) { reservoir(filled) = k; filled += 1 }
            else {
              val j = (rnd.nextDouble() * (seen + 1)).toLong
              if (j < reservoir.length) reservoir(j.toInt) = k
            }
            seen += 1
          }
        }
        reservoir.take(filled).iterator
      }
      .collect()
      .sorted
    val bounds: Array[Long] =
      if (sampled.isEmpty) Array.empty
      else {
        val cuts = (1 until targetParts)
          .map(i => sampled(((i.toLong * sampled.length) / targetParts).toInt))
        cuts.distinct.sorted.toArray
      }
    val nParts = bounds.length + 1

    // 2. tag + route; sort key (part, key, side) so the sweep sees
    // ascending keys with lefts-before-rights on ties (either order is
    // correct; fixing it keeps the shuffle layout deterministic)
    type TK = (Int, Long, Byte)
    val taggedLeft: RDD[(TK, UnsafeRow)] = leftRdd.mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(lOut, lOut)
      it.flatMap { row =>
        val v = lKeyBound.eval(row)
        if (v == null) Iterator.empty
        else {
          val k = v.asInstanceOf[Long]
          Iterator(((owner(bounds, k), k, 0: Byte), toUnsafe(row).copy()))
        }
      }
    }
    val taggedRight: RDD[(TK, UnsafeRow)] = rightRdd.mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(rOut, rOut)
      it.flatMap { row =>
        val v = rKeyBound.eval(row)
        if (v == null) Iterator.empty
        else {
          val k = v.asInstanceOf[Long]
          val u = toUnsafe(row).copy()
          val pLo = owner(bounds, math.subtractExact(k, eps))
          val pHi = owner(bounds, math.addExact(k, eps))
          (pLo to pHi).iterator.map(p => ((p, k, 1: Byte), u))
        }
      }
    }
    val partitioner = new Partitioner {
      override def numPartitions: Int = nParts
      override def getPartition(key: Any): Int = key.asInstanceOf[TK]._1
    }
    val sorted = (taggedLeft ++ taggedRight)
      .repartitionAndSortWithinPartitions(partitioner)

    // 3. forward sweep: evict out-of-band heads, match the full
    // opposite deque (all survivors are within ε by the sort order)
    sorted.mapPartitions { it =>
      val joiner = new JoinedRow
      val project = UnsafeProjection.create((lOut ++ rOut).map(_.dataType).toArray)
      val leftBuf = new java.util.ArrayDeque[(Long, UnsafeRow)]()
      val rightBuf = new java.util.ArrayDeque[(Long, UnsafeRow)]()
      it.flatMap { case ((_, k, side), row) =>
        if (side == 0) {
          while (!rightBuf.isEmpty && rightBuf.peekFirst()._1 < k - eps)
            rightBuf.pollFirst()
          leftBuf.addLast((k, row))
          val l = row
          rightBuf.iterator().asScala.map { case (_, r) => project(joiner(l, r)) }
        } else {
          while (!leftBuf.isEmpty && leftBuf.peekFirst()._1 < k - eps)
            leftBuf.pollFirst()
          rightBuf.addLast((k, row))
          val r = row
          leftBuf.iterator().asScala.map { case (_, l) => project(joiner(l, r)) }
        }
      }
    }
  }
}

/** Programmatic entry: `BandJoin(left, right, "l_key", "r_key", eps)`.
  * Lives in this package for `Dataset.ofRows` access; the public API is
  * [[graft.ops.Joins.bandJoin]].
  */
object BandJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      epsilon: Long): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(BandJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BandJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def key(plan: LogicalPlan, name: String, side: String): Attribute = {
      val a = plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side key column '$name' not found in ${plan.output.map(_.name).mkString(", ")}"))
      require(a.dataType == LongType,
        s"$side key '$name' must be LONG (integer band semantics), got ${a.dataType}")
      a
    }
    require(
      lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "bandJoin sides must not share attributes (alias one side of a self-join first)")
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark,
      BandJoinPlan(lPlan, rPlan,
        key(lPlan, leftKeyCol, "left"), key(rPlan, rightKeyCol, "right"), epsilon))
  }
}

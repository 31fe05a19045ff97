package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches (Apache DataSketches HLL via Spark's built-in
  * `hll_sketch_agg` family) — the approximate side of the exact
  * `countDistinct` operators, and the third sketch next to the
  * MinHash signature/Aggregator pair.
  *
  * Why it matters at 100 TB: exact distinct counts shuffle every
  * distinct key once (two-phase distinct agg); an HLL sketch is a
  * FIXED-SIZE (2^lgK registers) mergeable state — partials combine
  * map-side, the shuffle carries kilobytes per group regardless of
  * cardinality, and sketches persisted per partition/day can be
  * re-unioned later without touching raw data (the same
  * merge-across-strata contract MinHashSketchAggregator proves for
  * Jaccard).
  *
  * Determinism: HLL register updates are a pure function of the input
  * VALUE SET (hash-based, order- and partitioning-independent), so
  * estimates are bit-stable across re-runs and cluster layouts —
  * SkewAndSketchSpec pins estimate equality under repartitioning and
  * sketch-union vs union-sketch equivalence. Not DuckDB-oracle-checked
  * (different HLL implementations estimate differently); the spec
  * asserts relative-error bounds against the exact count instead.
  */
object Sketches {

  /** Per-group approximate distinct count of `keyCol`. */
  def hllDistinctPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(keyCol), lit(lgConfigK))).as("approx_distinct"))

  /** Binary HLL sketch per group — the persistable partial. */
  def hllSketchPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"))

  /** Merge previously-built sketches (e.g. per-day partials) into one
    * estimate per group: union-of-sketches == sketch-of-union.
    */
  def hllMergeEstimate(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-data preparation: target
  * encoding, winsorization, the hashing trick, and exact-reproducible
  * Pearson correlation. These extend the reference's feature matrix
  * stage (`prepare_training_data_pyspark.py:441-632` builds 18 base
  * features with log1p/coalesce/when) with the standard tabular-ML
  * encoders a large-scale pipeline needs.
  *
  * Float discipline (CLAUDE.md): every double is derived from exact
  * integer/decimal aggregates and quantized to integer micro units at
  * the contract boundary, so results are bit-identical across engines,
  * partitionings, and re-runs.
  */
object FeatureEng {

  /** Smoothed target (mean) encoding of a categorical key against a
    * 0/1 label: te = (pos + alpha·prior) / (n + alpha), with prior the
    * global positive rate. One two-phase hash aggregation over the
    * fact table + a single-row global aggregate broadcast into the
    * result — no shuffle carries raw rows, so the shape holds at any
    * scale. The encoded value is exact: all inputs are counts < 2^53,
    * so the double arithmetic is deterministic IEEE and the micro
    * quantization is reproducible cross-engine.
    *
    * @param df      fact rows
    * @param keyCol  categorical column to encode
    * @param labelCol 0/1 integer label column
    * @param alpha   smoothing pseudo-count
    */
  def targetEncoding(
      df: DataFrame,
      keyCol: String,
      labelCol: String,
      alpha: Int): DataFrame = {
    val global = df.agg(
      count(lit(1)).as("g_n"),
      sum(col(labelCol).cast("long")).as("g_pos"))
    val per = df
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(labelCol).cast("long")).as("pos"))
    val prior = col("g_pos").cast("double") / col("g_n").cast("double")
    val te = (col("pos").cast("double") + lit(alpha.toDouble) * prior) /
      (col("n_rows").cast("double") + lit(alpha.toDouble))
    per
      .crossJoin(broadcast(global))
      .select(
        col(keyCol),
        col("n_rows"),
        floor(lit(1000000.0) * te).cast("long").as("te_micro"))
  }

  /** Winsorized per-group stats: clamp `valueCol` to its group's
    * [loPpm, hiPpm] exact order statistics (k-th smallest, k =
    * max(1, ⌈ppm·n/10⁶⌉) computed in pure INTEGER math — a float
    * ceil(p·n) is a cross-engine hazard: 0.05·n is decimal-exact in
    * one engine and an epsilon above the integer in IEEE double,
    * flipping the ceil exactly when n is a multiple of 20), then
    * return count / thresholds / clipped mean.
    *
    * Plan — support-grain, never a corpus-rate rank window: the fact
    * collapses map-side to a (group, value, count) support, BOTH ppm
    * ranks are read off one [[Windows.shardedCumsumBy]] cumulative
    * pass over that support (value at rank k = min value with
    * cum ≥ k — tie-break-independent, identical to the k-th row of any
    * total order; `tieCols` is retained only for API stability), and
    * the clipped mean is `Σ clip(v)·cnt / n` on the support itself —
    * so every exchange is bounded by the VALUE DOMAIN, not the corpus.
    * The previous form shuffled raw rows onto a |groups|-key
    * row_number partitioning: parallelism bounded by group count, one
    * hot task per group at scale (q99 was 16.4 MB / ~4 active
    * partitions at sf0.1). `valueCol` must be NUMERIC (the shard
    * bucket divides it; a string would coerce to one NULL shard and a
    * timestamp fails analysis).
    */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCols: Seq[String],
      loPpm: Long = 50000L,
      hiPpm: Long = 950000L): DataFrame = {
    val _ = tieCols
    // r15: both ppm thresholds come off ONE hot-bucket rank pass
    // ([[graft.ops.Stats.ranksHotBucket]], width-64 buckets) and the
    // clipped mean is a RAW-ROW aggregate under the broadcast
    // thresholds — the r13 support-cumsum form built a full
    // (group, value, count) support, which on near-unique price values
    // is ≈ the fact itself (a row-grain exchange; the q114 regression
    // class). Exchanges now: bucket-grain histogram partials + the
    // rank buckets' slice (≈ rows·64/span) + a |groups|-row agg.
    // exact ⌈ppm·n/10⁶⌉ ranks; n must stay below ~9.7e12 per group
    // (long overflow bound of n·ppm) — a float ceil(p·n) flips exactly
    // when p·n is a whole number, hence the pure-integer form
    def kOf(ppm: Long): String =
      s"greatest((n_total * $ppm + 999999) div 1000000, 1L)"
    val base = graft.core.Caches.materialized(
      df.select(col(groupCol), col(valueCol).as("__v")))
    val thresholds = graft.ops.Stats.ranksHotBucket(
      base, Seq(groupCol), "__v",
      Seq(("p_lo", kOf(loPpm)), ("p_hi", kOf(hiPpm))),
      expr("cast(floor(__v / 64) as long)"))
      .select(col(groupCol), col("p_lo"), col("p_hi"))
    base
      .join(broadcast(thresholds), Seq(groupCol))
      .withColumn("v_clip", least(greatest(col("__v"), col("p_lo")), col("p_hi")))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("p_lo")).as("p_lo"),
        max(col("p_hi")).as("p_hi"),
        // Σ clip(v) as exact hi/lo bigint split (value-identical to the
        // decimal(28,4) sum — Aggregates.exactSum) — order-independent,
        // so the final double division chain is bit-identical to the
        // support form
        floor(lit(1000000.0) *
          graft.ops.Aggregates.exactSum(col("v_clip"), 4) /
          count(lit(1)).cast("double")).cast("long").as("avg_clip_micro"))
  }

  /** Hashing trick over whitespace tokens: md5-derived bucket in
    * [0, nBuckets) and a ±1 sign bit (the signed variant keeps the
    * hashed representation unbiased, Weinberger et al. 2009). Pure
    * scan-side projection + one hash aggregation keyed by bucket —
    * the output is nBuckets rows regardless of corpus size, and the
    * md5 hash reproduces exactly in any engine.
    */
  def featureHash(df: DataFrame, textCol: String, nBuckets: Int): DataFrame = {
    val toks = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // ONE kernel md5 per token: bucket = top 32 bits (first 8 hex),
    // sign = hex char 9's low bit = bit 24 of the 60-bit prefix —
    // bit-identical to the two conv(substring(md5)) reads the SQL twin
    // keeps, at half the hashing
    val h60 = org.apache.spark.sql.graft.VectorExpressions.md5Prefix60(col("tok"))
    val bucket = shiftright(h60, 28) % nBuckets
    val sign = when(
      shiftright(h60, 24) % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    toks
      .select(bucket.as("bucket"), sign.as("sign"), col("tok"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("sign")).as("signed_sum"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_terms"))
  }

  /** Per-group Pearson correlation of column pairs, micro-quantized.
    * Single two-phase aggregation computing exact decimal sums of x, y,
    * x², y², xy (the per-row products of ≤2-decimal doubles are exact
    * in both the double and the decimal(28,4), so the sums are
    * order-independent), then the textbook formula in double — identical
    * IEEE operations reproduce bit-for-bit cross-engine.
    *
    * @param pairs (xCol, yCol, outName) triples; each yields one
    *              `<outName>_micro` column (null when degenerate).
    */
  def pearsonMicro(
      df: DataFrame,
      groupCol: String,
      pairs: Seq[(String, String, String)]): DataFrame = {
    // exact decimal-equivalent sums via the hi/lo bigint split (see
    // Aggregates.exactSum — the per-row Decimal buffer round-trip was
    // ~750 ns/row; ten of these made q101 aggregate-bound)
    def s(c: Column): Column = graft.ops.Aggregates.exactSum(c, 4)
    val aggs = pairs.flatMap { case (x, y, nm) =>
      Seq(
        s(col(x)).as(s"sx_$nm"),
        s(col(y)).as(s"sy_$nm"),
        s(col(x) * col(x)).as(s"sxx_$nm"),
        s(col(y) * col(y)).as(s"syy_$nm"),
        s(col(x) * col(y)).as(s"sxy_$nm"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val base = df
      .groupBy(col(groupCol))
      .agg(allAggs.head, allAggs.tail: _*)
    val outCols = pairs.map { case (_, _, nm) =>
      val nD = col("n_rows").cast("double")
      val num = nD * col(s"sxy_$nm") - col(s"sx_$nm") * col(s"sy_$nm")
      val den = sqrt(
        (nD * col(s"sxx_$nm") - col(s"sx_$nm") * col(s"sx_$nm")) *
          (nD * col(s"syy_$nm") - col(s"sy_$nm") * col(s"sy_$nm")))
      when(den === 0.0, lit(null))
        .otherwise(floor(lit(1000000.0) * num / den))
        .cast("long")
        .as(s"${nm}_micro")
    }
    base.select(col(groupCol) +: col("n_rows") +: outCols: _*)
  }
}

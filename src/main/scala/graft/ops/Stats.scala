package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-statistics and rank-test operators over COUNT-compressED
  * supports: every operator here takes (or builds) a `(key, count)`
  * support table — support-sized, map-side combinable — and runs its
  * one ordered step through [[Windows.shardedCumsum]]/
  * [[Windows.shardedCumsumBy]], so no statistic ever pulls a raw
  * sample (or even a whole support) into one task. The family contract
  * matches the experimentation queries (q154/q158–q165): exact integer
  * moments end-to-end, with at most ONE final double chain written
  * textually identically in the DuckDB oracle (correctly-rounded IEEE
  * ops on identical exact inputs are bit-identical cross-engine).
  */
object Stats {

  /** Kruskal–Wallis H rank test across k classes of `valueCol` — the
    * k-group extension of the Mann–Whitney shape (MWU asks which of
    * TWO samples dominates; KW asks whether ANY of k differs).
    * Tie-corrected midranks are kept integer by DOUBLING (2·midrank =
    * 2·c_before + t + 1), so every per-class rank sum `r<i>_x2` is
    * exact; `h_micro` is the one double chain: tie-corrected
    * `H / (1 − Σ(t³−t)/(N³−N))`, micro-rounded.
    *
    * `shardExpr` must be a monotone bucket of `valueCol` (the
    * [[Windows.shardedCumsum]] contract). Output: one row with
    * `n<i>`, `r<i>_x2` per class (1-based), `ties3`, `h_micro`.
    */
  def kruskalWallisMicro(
      df: DataFrame,
      valueCol: String,
      classCol: String,
      classes: Seq[String],
      shardExpr: Column): DataFrame = {
    require(classes.nonEmpty)
    val k = classes.size
    val cnts = classes.zipWithIndex.map { case (c, i) =>
      Aggregates.countIf(col(classCol) === c).as(s"c$i")
    }
    val counts = df
      .filter(col(classCol).isin(classes: _*))
      .groupBy(col(valueCol))
      .agg(cnts.head, cnts.tail: _*)
      .withColumn("t", (0 until k).map(i => col(s"c$i")).reduce(_ + _))
    val aggs =
      (0 until k).map(i => sum(col(s"c$i")).as(s"n${i + 1}")) ++
        (0 until k).map(i => sum(col(s"c$i") * col("mid2")).as(s"r${i + 1}_x2")) :+
        sum(col("t") * col("t") * col("t") - col("t")).as("ties3")
    Windows
      .shardedCumsum(counts, valueCol, Seq("t"), shardExpr)
      .withColumn("mid2", (col("cum_t") - col("t")) * 2 + col("t") + 1)
      .agg(aggs.head, aggs.tail: _*)
      // H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1) with R_j = r_x2/2, then the
      // tie-correction divisor — the ONE shared template, so the Spark
      // expression and the oracle SQL cannot drift
      .withColumn("h_micro", expr(kruskalWallisHSql(k)))
  }

  /** Oracle-SQL twin of [[kruskalWallisMicro]]'s `h_micro` expression —
    * generated from the same template so the two sides cannot drift.
    */
  def kruskalWallisHSql(k: Int): String = {
    val nSum = (1 to k).map(i => s"n$i").mkString(" + ")
    val sTerm = (1 to k)
      .map(i =>
        s"CAST(r${i}_x2 AS DOUBLE) * CAST(r${i}_x2 AS DOUBLE) / CAST(n$i AS DOUBLE)")
      .mkString(" + ")
    s"""CAST(round((3.0 * ($sTerm)
       |  / (CAST($nSum AS DOUBLE) * CAST($nSum + 1 AS DOUBLE))
       |  - 3.0 * CAST($nSum + 1 AS DOUBLE))
       | / (1.0 - CAST(ties3 AS DOUBLE)
       |    / (CAST($nSum AS DOUBLE) * CAST($nSum AS DOUBLE)
       |       * CAST($nSum AS DOUBLE) - CAST($nSum AS DOUBLE)))
       | * 1000000) AS BIGINT)""".stripMargin
  }

  /** Type-1 (lower-middle) median per group from a COUNT-compressed
    * support `(partCols..., keyCol, cntCol)`: rank `(n+1) div 2` over
    * the key order — the selected value is an actual data point,
    * deterministic among duplicates. One sharded cumulative pass +
    * one broadcast totals join; never a per-row window.
    * Output: partCols + `(n_total, median)` where median is named
    * `<outName>`.
    */
  def medianFromCounts(
      counts: DataFrame,
      partCols: Seq[String],
      keyCol: String,
      cntCol: String,
      shardExpr: Column,
      outName: String): DataFrame = {
    val cums = Windows.shardedCumsumBy(counts, partCols, keyCol, Seq(cntCol), shardExpr)
    val tot = counts
      .groupBy(partCols.map(col): _*)
      .agg(sum(col(cntCol)).as("n_total"))
    val joined =
      if (partCols.isEmpty) cums.crossJoin(broadcast(tot))
      else cums.join(broadcast(tot), partCols)
    joined
      .filter(col(s"cum_$cntCol") >= expr("(n_total + 1) div 2"))
      .groupBy((partCols.map(col) :+ col("n_total")): _*)
      .agg(min(col(keyCol)).as(outName))
  }

  /** Trimmed mean per group from a COUNT-compressed support: drop the
    * lowest and highest `trimPpm` (floor, in rows) of each group's
    * distribution and average the rest — the outlier-robust mean that
    * DROPS tails where q99's winsorize CLAMPS them. Pure integer: the
    * kept mass of a tied block is its overlap with the kept rank
    * interval `[lo+1, n−lo]` (`lo = n·trimPpm div 1e6` — floor
    * division, identical in both engines), and the mean emits in micro
    * units of the key via integer division. Output: partCols +
    * `(n_total, n_kept, kept_sum, trimmed_mean_micro)`.
    */
  def trimmedMeanMicroFromCounts(
      counts: DataFrame,
      partCols: Seq[String],
      keyCol: String,
      cntCol: String,
      shardExpr: Column,
      trimPpm: Long): DataFrame = {
    val cums = Windows.shardedCumsumBy(counts, partCols, keyCol, Seq(cntCol), shardExpr)
    val tot = counts
      .groupBy(partCols.map(col): _*)
      .agg(sum(col(cntCol)).as("n_total"))
    val joined =
      if (partCols.isEmpty) cums.crossJoin(broadcast(tot))
      else cums.join(broadcast(tot), partCols)
    joined
      .withColumn("__lo", expr(s"n_total * $trimPpm div 1000000"))
      .withColumn(
        "__kept",
        greatest(
          lit(0L),
          least(col(s"cum_$cntCol"), col("n_total") - col("__lo")) -
            greatest(col(s"cum_$cntCol") - col(cntCol), col("__lo"))))
      .groupBy((partCols.map(col) :+ col("n_total")): _*)
      .agg(
        sum(col("__kept")).as("n_kept"),
        sum(col("__kept") * col(keyCol)).as("kept_sum"))
      .withColumn(
        "trimmed_mean_micro", expr("kept_sum * 1000000 div n_kept"))
  }

  /** Spearman rank correlation ρ between paired series `(xCol, yCol)`:
    * Pearson on tie-averaged midranks, kept exact-integer by DOUBLING
    * (the [[kruskalWallisMicro]] mid2 trick: 2·midrank = 2·c_before +
    * t + 1 — doubling both rank series leaves ρ unchanged), so every
    * rank moment is an exact integer; `rho_micro` is the one shared
    * [[Graph.pearsonMicroSql]] double chain, micro-rounded identically
    * in the oracle, NULL when either rank series is constant.
    *
    * Shape: the fact pass collapses to the JOINT `(x, y)` support
    * (map-side combinable); midranks come from the two marginal
    * supports via [[Windows.shardedCumsum]] (never a single-partition
    * window) and attach back with two broadcast support-sized joins.
    * Int64 bound: doubled ranks reach 2n+…, so n·Σ(mid2²) ~ 4n⁴ —
    * exact to n ≈ 38k observations (daily/bounded series, the q159
    * regime); the same loud assert_true guard as
    * [[Graph.degreeAssortativityMicro]] fails past it.
    *
    * `shardX`/`shardY` must be monotone buckets of the x / y values
    * (the [[Windows.shardedCumsum]] contract), written against the
    * ORIGINAL column names. Output: one row
    * `(n, sx, sy, sxy, sx2, sy2, rho_micro)` of doubled-rank moments.
    */
  def spearmanRhoMicro(
      df: DataFrame,
      xCol: String,
      yCol: String,
      shardX: Column,
      shardY: Column): DataFrame = {
    val joint = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("cnt"))
    def mid2(c: String, shard: Column): DataFrame = {
      val counts = df.groupBy(col(c)).agg(count(lit(1)).as("t"))
      Windows
        .shardedCumsum(counts, c, Seq("t"), shard)
        .select(col(c), ((col("cum_t") - col("t")) * 2 + col("t") + 1).as(s"mid2_$c"))
    }
    joint
      .join(broadcast(mid2(xCol, shardX)), Seq(xCol))
      .join(broadcast(mid2(yCol, shardY)), Seq(yCol))
      .agg(
        sum(col("cnt")).as("n"),
        sum(col("cnt") * col(s"mid2_$xCol")).as("sx"),
        sum(col("cnt") * col(s"mid2_$yCol")).as("sy"),
        sum(col("cnt") * col(s"mid2_$xCol") * col(s"mid2_$yCol")).as("sxy"),
        sum(col("cnt") * col(s"mid2_$xCol") * col(s"mid2_$xCol")).as("sx2"),
        sum(col("cnt") * col(s"mid2_$yCol") * col(s"mid2_$yCol")).as("sy2"))
      .withColumn("__ovf_ok", expr(
        """assert_true(
          |  n = 0 OR (
          |    greatest(abs(sxy), sx2, sy2)
          |      <= 9223372036854775807 div n
          |    AND greatest(abs(sx), abs(sy)) <= 3037000499),
          |  'spearmanRhoMicro: int64 rank-moment overflow -- bounded-series operator, n <= ~38k')"""
          .stripMargin))
      .withColumn("rho_micro",
        when(col("__ovf_ok").isNull, expr(Graph.pearsonMicroSql)))
      .drop("__ovf_ok")
  }

  /** Welch two-sample t statistic (unequal variances) from a
    * COUNT-compressed integer support `(keyCol, aCntCol, bCntCol)` —
    * "are purchase and view order values drawn from the same mean"
    * without the pooled-variance assumption the classic t test makes.
    * The three moments per sample (n, Σk, Σk²) are exact integers from
    * ONE support-sized aggregation; `t_micro` and the
    * Welch–Satterthwaite `dof_micro` are the one double chain, written
    * by [[welchTSql]]/[[welchDofSql]] so the oracle cannot drift.
    * NULL when either sample has < 2 observations or both variances
    * are 0. Int64 bound on Σk²: guarded loud via max|k| and n (double
    * comparison — a guard, not a contract column).
    *
    * Output: one row `(na, sa, ssa, nb, sb, ssb, t_micro, dof_micro)`.
    */
  def welchTMicroFromCounts(
      counts: DataFrame,
      keyCol: String,
      aCntCol: String,
      bCntCol: String): DataFrame = {
    val k = col(keyCol)
    counts
      .agg(
        sum(col(aCntCol)).as("na"),
        sum(col(aCntCol) * k).as("sa"),
        sum(col(aCntCol) * k * k).as("ssa"),
        sum(col(bCntCol)).as("nb"),
        sum(col(bCntCol) * k).as("sb"),
        sum(col(bCntCol) * k * k).as("ssb"),
        max(abs(k)).as("__max_k"))
      .withColumn("__ovf_ok", expr(
        """assert_true(
          |  coalesce(na, 0) + coalesce(nb, 0) = 0 OR
          |  cast(na + nb as double) * cast(__max_k as double) * cast(__max_k as double)
          |    < 9.1e18,
          |  'welchTMicroFromCounts: int64 sum-of-squares overflow -- rescale the key')"""
          .stripMargin))
      .withColumn("t_micro", when(col("__ovf_ok").isNull, expr(welchTSql)))
      .withColumn("dof_micro", when(col("__ovf_ok").isNull, expr(welchDofSql)))
      .drop("__max_k", "__ovf_ok")
  }

  /** The squared-standard-error term s²ᵢ/nᵢ of one Welch sample —
    * spelled once so every use in [[welchTSql]]/[[welchDofSql]] (and
    * the oracle) is textually identical, which is what makes the IEEE
    * chains bit-identical cross-engine.
    */
  private def welchVn(n: String, s: String, ss: String): String =
    s"((CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE) / CAST($n AS DOUBLE))" +
      s" / CAST($n - 1 AS DOUBLE) / CAST($n AS DOUBLE))"

  /** Oracle-SQL twin of [[welchTMicroFromCounts]]'s `t_micro`. Expects
    * columns `na, sa, ssa, nb, sb, ssb`.
    */
  val welchTSql: String = {
    val va = welchVn("na", "sa", "ssa")
    val vb = welchVn("nb", "sb", "ssb")
    s"""CASE WHEN na < 2 OR nb < 2 OR $va + $vb = 0 THEN NULL
       | ELSE CAST(round(
       |   (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
       |   / sqrt($va + $vb) * 1000000) AS BIGINT) END""".stripMargin
  }

  /** Oracle-SQL twin of [[welchTMicroFromCounts]]'s Welch–Satterthwaite
    * `dof_micro`. Expects columns `na, sa, ssa, nb, sb, ssb`.
    */
  val welchDofSql: String = {
    val va = welchVn("na", "sa", "ssa")
    val vb = welchVn("nb", "sb", "ssb")
    s"""CASE WHEN na < 2 OR nb < 2 OR $va + $vb = 0 THEN NULL
       | ELSE CAST(round(
       |   ($va + $vb) * ($va + $vb)
       |   / ($va * $va / CAST(na - 1 AS DOUBLE) + $vb * $vb / CAST(nb - 1 AS DOUBLE))
       |   * 1000000) AS BIGINT) END""".stripMargin
  }

  /** McNemar test on PAIRED binary outcomes `(aCol, bCol)` (one row
    * per subject, values 0/1): did treatment A help on the subjects
    * where B failed, beyond the reverse — the correct test for
    * comparing two retrieval strategies on the SAME anchors, where the
    * two-proportion z test double-counts the concordant mass. Pure
    * integer end-to-end: the statistic `(n10−n01)²·1e6 div (n10+n01)`
    * needs no doubles at all (χ²₁, without continuity correction);
    * NULL when there are no discordant pairs. Output: one row
    * `(n, n11, n10, n01, n00, chi2_micro)`.
    *
    * Shape: one map-side-combinable agg over the paired flags —
    * line-rate, no joins here (building the flags is the caller's
    * semi-join business).
    */
  def mcnemarMicro(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.agg(
        count(lit(1)).as("n"),
        Aggregates.countIf(col(aCol) === 1 && col(bCol) === 1).as("n11"),
        Aggregates.countIf(col(aCol) === 1 && col(bCol) === 0).as("n10"),
        Aggregates.countIf(col(aCol) === 0 && col(bCol) === 1).as("n01"),
        Aggregates.countIf(col(aCol) === 0 && col(bCol) === 0).as("n00"))
      .withColumn(
        "chi2_micro",
        expr("""CASE WHEN n10 + n01 = 0 THEN NULL
               | ELSE (n10 - n01) * (n10 - n01) * 1000000 div (n10 + n01) END""".stripMargin))

  /** Exact Gini coefficient of a nonnegative integer quantity from its
    * COUNT-compressed support `(valCol, cntCol)` — the inequality
    * measure behind "does the recommender expose a few head items to
    * everyone" (exposure Gini) and any concentration report. Uses the
    * rank-block identity: with items sorted ascending, a tied block of
    * t items at value v and c_before predecessors contributes
    * v·(c_before·t + t(t+1)/2) to Σ rank·x — all exact integers off
    * ONE [[Windows.shardedCumsum]] pass over the support, so
    * G = (2·Σrank·x − (n+1)·Σx) / (n·Σx) needs no sort of the raw
    * rows and no doubles (`gini_micro` is a single integer floor
    * division). NULL when n = 0 or Σx = 0. Int64 bound: Σrank·x ≲
    * n·Σx must stay under 9.2e12 (the ·1e6 scaling) — loud assert
    * past it. Output: one row `(n, total, gini_micro)`.
    */
  def giniMicroFromCounts(
      counts: DataFrame,
      valCol: String,
      cntCol: String,
      shardExpr: Column): DataFrame =
    Windows
      .shardedCumsum(counts, valCol, Seq(cntCol), shardExpr)
      .withColumn(
        "rank_sum",
        expr(s"""$valCol * ((cum_$cntCol - $cntCol) * $cntCol
                | + ($cntCol * ($cntCol + 1)) div 2)""".stripMargin))
      .agg(
        sum(col(cntCol)).as("n"),
        sum(col(valCol) * col(cntCol)).as("total"),
        sum(col("rank_sum")).as("s_rank"))
      .withColumn("__ovf_ok", expr(
        """assert_true(
          |  coalesce(n, 0) = 0 OR
          |  greatest(abs(2 * s_rank - (n + 1) * total), n * total)
          |    <= 9223372036854775807 div 1000000,
          |  'giniMicroFromCounts: int64 overflow in the rank sum -- rescale the value')"""
          .stripMargin))
      .withColumn(
        "gini_micro",
        when(col("__ovf_ok").isNull, expr(
          """CASE WHEN n = 0 OR total = 0 THEN NULL
            | ELSE (2 * s_rank - (n + 1) * total) * 1000000 div (n * total) END"""
            .stripMargin)))
      .select(col("n"), col("total"), col("gini_micro"))

  /** Benford first-digit expected frequencies, ppm: round(log10(1 +
    * 1/d)·1e6) for d = 1..9 — precomputed integer literals (the q138
    * discount-table pattern: no runtime transcendental on either
    * side). They sum to exactly 1,000,000.
    */
  val benfordPpm: Seq[(Long, Long)] = Seq(
    1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
    5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)

  /** Oracle-SQL twin of the per-digit Benford χ² cell `(obs − E)²/E`
    * with E = n_values·exp_ppm/1e6, micro-rounded. Expects columns
    * `obs, exp_ppm, n_values`.
    */
  val benfordCellSql: String =
    """CAST(round(
      |  (CAST(obs AS DOUBLE) - CAST(n_values AS DOUBLE) * CAST(exp_ppm AS DOUBLE) / 1000000.0)
      |  * (CAST(obs AS DOUBLE) - CAST(n_values AS DOUBLE) * CAST(exp_ppm AS DOUBLE) / 1000000.0)
      |  / (CAST(n_values AS DOUBLE) * CAST(exp_ppm AS DOUBLE) / 1000000.0)
      |  * 1000000) AS BIGINT)""".stripMargin

  /** Oracle-SQL twin of the variance-to-mean ratio (index of
    * dispersion / Fano factor) from exact integer moments — the
    * Poisson sanity check (VMR ≈ 1 Poisson, ≫ 1 bursty). Expects
    * columns `n, s, ss`; NULL when n < 2 or the mean is 0.
    */
  val vmrMicroSql: String =
    """CASE WHEN n < 2 OR s = 0 THEN NULL
      | ELSE CAST(round(
      |   (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |   / CAST(n - 1 AS DOUBLE)
      |   / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |   * 1000000) AS BIGINT) END""".stripMargin

  /** Two-sample Anderson–Darling A² (Scholz–Stephens k-sample form,
    * midrank/ties version, k = 2) from the COUNT-compressed support
    * `(keyCol, aCntCol, bCntCol)` — the tail-sensitive member of the
    * drift family: KS (q154) sees only the single largest CDF gap,
    * AD integrates the squared gap with 1/(F(1−F)) weights, so
    * divergence IN THE TAILS (where F(1−F) → 0) is exactly what it
    * amplifies. Completes q118 PSI / q119+q154 KS / q151 JS / q165
    * MWU with the statistic practitioners reach for when tail drift
    * matters.
    *
    * Everything up to each block's cell is exact integer off ONE
    * [[Windows.shardedCumsum]] pass: doubled midrank cumulatives
    * B2 = 2·cum − t and per-sample M2 = 2·cum_i − c_i keep the
    * half-ranks integral, and the identity
    * (N·M − n·B)²/(B(N−B) − Nt/4) = (N·M2 − n·B2)²/(B2(2N−B2) − N·t)
    * clears the quarters. Each block's two cells are the one shared
    * double chain ([[adCellSql]]), micro-rounded, then summed as exact
    * integers (the q174 per-cell pattern). Degenerate blocks
    * (denominator ≤ 0 — a single all-value block) drop out. Int64
    * bound: N·M2 ≤ 2N² ⇒ exact to N ≈ 2·10⁹ pooled observations.
    * Output: one row `(na, nb, n_blocks, a2_micro)`.
    */
  def andersonDarlingMicroFromCounts(
      counts: DataFrame,
      keyCol: String,
      aCntCol: String,
      bCntCol: String,
      shardExpr: Column): DataFrame = {
    val base = counts
      .select(col(keyCol), col(aCntCol).as("ca"), col(bCntCol).as("cb"))
      .withColumn("tb", col("ca") + col("cb"))
    val tot = base.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    Windows
      .shardedCumsum(base, keyCol, Seq("ca", "cb", "tb"), shardExpr)
      .crossJoin(broadcast(tot))
      .withColumn("n_total", col("na") + col("nb"))
      .withColumn("b2", col("cum_tb") * 2 - col("tb"))
      .withColumn("m2a", col("cum_ca") * 2 - col("ca"))
      .withColumn("m2b", col("cum_cb") * 2 - col("cb"))
      .withColumn("denom",
        col("b2") * (col("n_total") * 2 - col("b2")) - col("n_total") * col("tb"))
      .filter(col("denom") > 0)
      .withColumn("cell_a", expr(adCellSql("a")))
      .withColumn("cell_b", expr(adCellSql("b")))
      .groupBy(col("na"), col("nb"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("cell_a") + col("cell_b")).as("a2_micro"))
  }

  /** Oracle-SQL twin of one sample's per-block Anderson–Darling cell
    * ((N−1)/N · t/(N·nᵢ) · (N·M2ᵢ − nᵢ·B2)²/denom, micro-rounded).
    * Expects columns `n_total, tb, b2, denom, n<s>, m2<s>`; NULL when
    * either sample is empty.
    */
  def adCellSql(sample: String): String = {
    val num = s"CAST(n_total * m2$sample - n$sample * b2 AS DOUBLE)"
    s"""CASE WHEN na = 0 OR nb = 0 THEN NULL
       | ELSE CAST(round(
       |  CAST(n_total - 1 AS DOUBLE) / CAST(n_total AS DOUBLE)
       |  * CAST(tb AS DOUBLE) / (CAST(n_total AS DOUBLE) * CAST(n$sample AS DOUBLE))
       |  * ($num * $num)
       |  / CAST(denom AS DOUBLE)
       |  * 1000000) AS BIGINT) END""".stripMargin
  }

  /** Oracle-SQL twin of the Fleiss κ chain for `nRaters` raters from
    * exact integer aggregates: `s2` = Σᵢⱼ n_ij² (n_ij = raters
    * assigning subject i to category j), `sc2` = Σⱼ(Σᵢ n_ij)²,
    * `n_docs` = N. P̄ = (s2 − N·n)/(N·n(n−1)), P̄ₑ = sc2/(N·n)²,
    * κ = (P̄ − P̄ₑ)/(1 − P̄ₑ) micro-rounded; NULL when N = 0 or the
    * raters are unanimous on one category everywhere (P̄ₑ = 1).
    */
  def fleissKappaSql(nRaters: Int): String = {
    val n = nRaters
    val pbar = s"((CAST(s2 AS DOUBLE) - CAST(n_docs AS DOUBLE) * $n.0)" +
      s" / (CAST(n_docs AS DOUBLE) * ${n * (n - 1)}.0))"
    val pe = s"(CAST(sc2 AS DOUBLE)" +
      s" / (CAST(n_docs AS DOUBLE) * $n.0 * CAST(n_docs AS DOUBLE) * $n.0))"
    s"""CASE WHEN n_docs = 0 OR sc2 = n_docs * n_docs * ${n * n} THEN NULL
       | ELSE CAST(round(($pbar - $pe) / (1.0 - $pe) * 1000000) AS BIGINT) END"""
      .stripMargin
  }

  /** Oracle-SQL twin of the difference-in-differences estimate in
    * micro units of the outcome, from the 8 exact integer cell
    * moments `(n_t1, s_t1, n_t2, s_t2, n_c1, s_c1, n_c2, s_c2)`
    * (t/c = treated/control, 1/2 = pre/post): (Δtreated − Δcontrol)
    * of the cell means; NULL when any cell is empty.
    */
  val didMicroSql: String = {
    def m(c: String) = s"CAST(s_$c AS DOUBLE) / CAST(n_$c AS DOUBLE)"
    s"""CASE WHEN n_t1 = 0 OR n_t2 = 0 OR n_c1 = 0 OR n_c2 = 0 THEN NULL
       | ELSE CAST(round(((${m("t2")} - ${m("t1")}) - (${m("c2")} - ${m("c1")}))
       |   * 1000000) AS BIGINT) END""".stripMargin
  }

  /** Wald SPRT per-observation log-likelihood-ratio increments for a
    * Bernoulli rate test of H1: p = 0.12 vs H0: p = 0.10, and the
    * symmetric decision bound ln((1−β)/α) at α = β = 0.05 —
    * precomputed micro literals (round(ln·1e6), the q138/Benford
    * pattern: no runtime transcendental on either side). A success
    * adds ln(p1/p0), a failure adds ln((1−p1)/(1−p0)); cross +bound →
    * accept H1, cross −bound → accept H0.
    */
  val SprtLlrSuccessMicro = 182322L
  val SprtLlrFailMicro = -22473L
  val SprtBoundMicro = 2944439L

  /** Kendall rank correlation τ-b between paired series `(xCol, yCol)`
    * (one row per observation; `tieCol` must be unique — pairs are
    * enumerated once as tie < tie). Concordant/discordant/tied pair
    * counts are exact integers from the pairwise join; `tau_b_micro`
    * is the one double chain (÷ √((n0−n1)(n0−n2))), micro-rounded
    * identically in the oracle.
    *
    * Scale: the pair join is |rows|² — intended for BOUNDED series
    * (daily aggregates: the q159 Theil–Sen regime), never facts.
    */
  def kendallTauBMicro(
      df: DataFrame,
      xCol: String,
      yCol: String,
      tieCol: String): DataFrame = {
    val a = df.select(
      col(tieCol).as("ka"), col(xCol).as("xa"), col(yCol).as("ya"))
    val b = df.select(
      col(tieCol).as("kb"), col(xCol).as("xb"), col(yCol).as("yb"))
    a.join(b, col("ka") < col("kb"))
      .agg(
        count(lit(1)).as("n0"),
        Aggregates
          .countIf((col("xa") - col("xb")) * (col("ya") - col("yb")) > 0)
          .as("n_c"),
        Aggregates
          .countIf((col("xa") - col("xb")) * (col("ya") - col("yb")) < 0)
          .as("n_d"),
        Aggregates.countIf(col("xa") === col("xb")).as("ties_x"),
        Aggregates.countIf(col("ya") === col("yb")).as("ties_y"))
      .withColumn(
        "tau_b_micro",
        expr("""CAST(round(CAST(n_c - n_d AS DOUBLE)
               | / sqrt(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE))
               | * 1000000) AS BIGINT)""".stripMargin))
  }
}

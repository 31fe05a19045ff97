package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Offline ranking-evaluation operators over labeled candidate pools —
  * the metric side of the reference's recall funnel
  * (`README.md:217,244`: "Recall@20: Retrieving the true category
  * within top-20 candidates", "Combining strategies achieves 95%+
  * recall"). Each prediction instance is a group of candidate rows
  * (one per candidate) carrying a 0/1 label; the generator's quality
  * is how often the true candidate is IN the pool (pool recall) and
  * how often a ranker puts it in the top k (recall@k).
  *
  * Scale shape: pool recall is one map-side-combined exchange on the
  * instance key; recall@k is the q06 pattern — one exchange for the
  * per-instance rank window, partial WindowGroupLimit before it. AUC
  * aggregates to score-distinct grain first (tree-ensemble scores have
  * ≤ leaves^trees distinct values, so the rank window runs on a frame
  * bounded by the score support, not the row count).
  *
  * Determinism: integer ppm outputs; every window order ends in a
  * unique tie-break (the engine rule).
  */
object Eval {

  /** Pool recall: share of instances whose candidate pool contains at
    * least one positive-labeled row, in exact integer ppm.
    * Output: one row (n_instances, n_hit, recall_ppm).
    */
  def poolRecallPpm(
      df: DataFrame,
      instanceCols: Seq[String],
      labelCol: String): DataFrame =
    df.groupBy(instanceCols.map(col): _*)
      .agg(max(col(labelCol).cast("long")).as("hit"))
      .agg(count(lit(1)).as("n_instances"), sum(col("hit")).as("n_hit"))
      .select(
        col("n_instances"),
        col("n_hit"),
        expr("n_hit * 1000000 div n_instances").as("recall_ppm"))

  /** Recall@k under a ranking: rank each instance's candidates by
    * `scoreCol` DESC (ties broken by `tieCols` ASC — mandatory for a
    * deterministic metric), and count instances whose top-k slice
    * contains a positive. Output: one row (k, n_instances, n_hit,
    * recall_ppm).
    */
  def recallAtKPpm(
      df: DataFrame,
      instanceCols: Seq[String],
      labelCol: String,
      scoreCol: Column,
      tieCols: Seq[String],
      k: Int): DataFrame = {
    val w = Window
      .partitionBy(instanceCols.map(col): _*)
      .orderBy(scoreCol.desc +: tieCols.map(c => col(c).asc): _*)
    df.withColumn("rn", row_number().over(w))
      .groupBy(instanceCols.map(col): _*)
      .agg(max(when(col("rn") <= k, col(labelCol).cast("long")).otherwise(0L))
        .as("hit"))
      .agg(count(lit(1)).as("n_instances"), sum(col("hit")).as("n_hit"))
      .select(
        lit(k).as("k"),
        col("n_instances"),
        col("n_hit"),
        expr("n_hit * 1000000 div n_instances").as("recall_ppm"))
  }

  /** Per-feature univariate signal screen: the tie-corrected ROC-AUC
    * of EACH numeric feature used directly as a ranking score against
    * the 0/1 label — the fast filter-method feature screen, and (run
    * on two splits and diffed) a TARGET-LEAKAGE detector: a feature
    * whose train-split AUC is far from its valid-split AUC was
    * computed with information the valid rows don't have.
    * RankerSpec proves the point on the reference's own shipped
    * artifacts: user_cat_hist screens at 0.92 train / 0.50 valid
    * because `prepare_training_data_pyspark.py:509-521` aggregates
    * user-category affinity over the WHOLE train window — each train
    * row's history includes its own label event. Fed to the GBT head,
    * the leak inverts generalization (valid AUC 0.34); screened out,
    * the same head reaches 0.975.
    *
    * One distributed pass: unpivot to (feature, score) — ×|features|
    * row fan-out — then ONE map-side-combined exchange to
    * score-support grain and a per-feature (partitioned, PlanSpec-safe)
    * cumulative window. Null scores are excluded per rank-statistic
    * convention and reported in n_null.
    * Output: one row per feature (feature, n_pos, n_neg, n_null,
    * auc_ppm), ordered by feature.
    */
  def labelSignalAucPpm(
      df: DataFrame,
      features: Seq[String],
      labelCol: String): DataFrame = {
    val stackArgs = features
      .map(f => s"'$f', cast(`$f` as double)").mkString(", ")
    val stacked = df.select(
      col(labelCol).cast("long").as("y"),
      expr(s"stack(${features.length}, $stackArgs) as (feature, s)"))
    // referenced twice (AUC branch + null-count branch): cached per the
    // 2+-reference rule so the corpus unpivot exchange runs once
    val byScore = graft.core.Caches.cache(stacked
      .groupBy(col("feature"), col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos")))
    val w = Window.partitionBy(col("feature")).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .filter(col("s").isNotNull)
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank2", (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
      .groupBy(col("feature"))
      .agg(
        sum(col("pos")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
        sum(col("pos") * col("rank2")).as("possum2"))
      .join(
        byScore.filter(col("s").isNull)
          .groupBy(col("feature")).agg(sum(col("cnt")).as("n_null")),
        // FULL outer, not left: a feature whose scores are ALL null has no
        // rows in the AUC branch at all — a left join would silently drop
        // the most broken feature from the screen. It must surface as
        // (n_pos=0, n_neg=0, auc_ppm=NULL, n_null=count).
        Seq("feature"), "full_outer")
      .select(
        col("feature"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        expr(
          """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            | ELSE CAST(round(
            |   (CAST(possum2 AS DOUBLE) / 2.0
            |     - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE) / 2.0)
            |   / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
            |   * 1000000) AS BIGINT) END""".stripMargin).as("auc_ppm"))
      .orderBy(col("feature"))
  }

  /** Fused ranking-eval: recall@`recallK` and MRR@`mrrK` of a scored,
    * labeled candidate pool in ONE window pass — the per-instance rank
    * is computed once and both metrics aggregate from it (running
    * [[recallAtKPpm]] and a separate MRR would re-run the upstream
    * scoring subtree per metric). MRR is exact-integer: per instance
    * `rr_ppm = 1000000 div rank-of-first-positive` (0 when none in the
    * top mrrK), averaged by integer division.
    * Output: one row (n_instances, n_hit_at<recallK>,
    * recall<recallK>_ppm, mrr<mrrK>_ppm).
    */
  def rankingEvalPpm(
      df: DataFrame,
      instanceCols: Seq[String],
      labelCol: String,
      scoreCol: Column,
      tieCols: Seq[String],
      recallK: Int,
      mrrK: Int): DataFrame = {
    val w = Window
      .partitionBy(instanceCols.map(col): _*)
      .orderBy(scoreCol.desc +: tieCols.map(c => col(c).asc): _*)
    df.withColumn("rn", row_number().over(w))
      .groupBy(instanceCols.map(col): _*)
      .agg(
        max(when(col("rn") <= recallK, col(labelCol).cast("long")).otherwise(0L))
          .as("hit"),
        min(when(col("rn") <= mrrK && col(labelCol).cast("long") === 1L, col("rn")))
          .as("first_pos"))
      .agg(
        count(lit(1)).as("n_instances"),
        sum(col("hit")).as("n_hit"),
        sum(coalesce(expr("1000000 div first_pos"), lit(0L))).as("rr_sum"))
      .select(
        col("n_instances"),
        col("n_hit").as(s"n_hit_at$recallK"),
        expr("n_hit * 1000000 div n_instances").as(s"recall${recallK}_ppm"),
        expr("rr_sum div n_instances").as(s"mrr${mrrK}_ppm"))
  }

  /** Calibration / reliability bins: bucket a ppm-scaled confidence
    * into `bins` equal-width bins and compare each bin's mean
    * confidence against its empirical positive rate — the reliability
    * diagram behind ECE (expected calibration error =
    * Σ_b n_b/N · |acc_b − conf_b|, derivable from the output). All
    * integer: bin = min(conf·bins div 10⁶, bins−1), means by integer
    * division. One map-side-combined exchange at bin grain.
    * Output: one row per non-empty bin
    * (bin, n, conf_avg_ppm, acc_ppm, gap_ppm), ordered by bin.
    */
  def calibrationBins(
      df: DataFrame,
      confPpmCol: Column,
      labelCol: String,
      bins: Int): DataFrame =
    df.select(confPpmCol.as("conf_ppm"), col(labelCol).cast("long").as("y"))
      // A confidence outside [0, 1e6] ppm is caller error, not data: a
      // negative conf would otherwise mint NEGATIVE bin ids as silent
      // extra output rows. Loud assert_true (NULL on success) gated into
      // the bin column per the suite's overflow-guard convention.
      // NULL confidences are caller error too (the guard condition is
      // NULL ⇒ assert trips); coalesce the interpolation so the error
      // message names the offending value instead of going blank
      .withColumn("__guard", expr(
        """assert_true(conf_ppm >= 0 AND conf_ppm <= 1000000,
          |  'calibrationBins: conf_ppm '
          |  || coalesce(cast(conf_ppm AS string), 'NULL')
          |  || ' outside [0, 1000000] -- scores must be non-null ppm-scaled')"""
          .stripMargin))
      .select(
        when(col("__guard").isNull,
          expr(s"least(conf_ppm * $bins div 1000000, ${bins - 1})")).as("bin"),
        col("conf_ppm"),
        col("y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("conf_ppm")).as("conf_sum"),
        sum(col("y")).as("n_pos"))
      .select(
        col("bin"),
        col("n"),
        expr("conf_sum div n").as("conf_avg_ppm"),
        expr("n_pos * 1000000 div n").as("acc_ppm"),
        expr("abs(conf_sum div n - n_pos * 1000000 div n)").as("gap_ppm"))
      .orderBy(col("bin"))

  /** Exact ROC-AUC of a score against a 0/1 label, tie-corrected
    * (Mann–Whitney with average ranks), in integer ppm. Aggregates to
    * score-distinct grain FIRST, so the global rank window runs over
    * the score support — bounded for tree ensembles / quantized scores
    * — never the row count. The one double division happens at the
    * end of an otherwise exact integer chain.
    * Output: one row (n_pos, n_neg, auc_ppm).
    */
  def aucPpm(df: DataFrame, scoreCol: Column, labelCol: String): DataFrame = {
    val byScore = df
      .groupBy(scoreCol.as("s"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    // average rank of a tied score group = (#rows below) + (cnt+1)/2;
    // kept as a doubled integer (2*rank) to stay exact through the sum
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum", sum(col("cnt")).over(w))
      // 2*avgRank = 2*(cum - cnt) + cnt + 1
      .withColumn("rank2", (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
      .agg(
        sum(col("pos")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
        sum(col("pos") * col("rank2")).as("possum2"))
      .select(
        col("n_pos"),
        col("n_neg"),
        expr(
          """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            | ELSE CAST(round(
            |   (CAST(possum2 AS DOUBLE) / 2.0
            |     - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE) / 2.0)
            |   / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
            |   * 1000000) AS BIGINT) END""".stripMargin).as("auc_ppm"))
  }
}

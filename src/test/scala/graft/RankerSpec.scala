package graft

import graft.ops.Eval
import graft.pipeline.Ranker
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GBT ranking head + leakage screen over the reference's SHIPPED
  * golden matrix (the AlsSpec pattern: model surfaces are
  * invariant-tested, not hash-oracled). Trains on a deterministic md5
  * sample of the train-artifact sessions and evaluates on the FULL
  * valid artifact — the workflow the reference README prescribes but
  * ships no code for (`README.md:196,218`).
  *
  * The headline finding this spec pins: the reference's shipped train
  * artifact carries TARGET LEAKAGE in its user-history features
  * (`prepare_training_data_pyspark.py:509-521` aggregates
  * user-category affinity over the whole train window, so each train
  * row's history includes its own label event). The engine's
  * per-feature signal screen detects it (0.92 train-AUC vs 0.50
  * valid-AUC), and the model contrast quantifies the damage: fed the
  * leak, the GBT head's valid AUC INVERTS to 0.34; screened, it
  * reaches 0.975 and recovers 98% of the candidate pool's recall
  * ceiling within the README's top-20 cut.
  */
class RankerSpec extends SparkSpec {

  private val trainPath = "/root/reference/data/processed/X_train_spark.parquet"
  private val validPath = "/root/reference/data/processed/X_valid_spark.parquet"

  private val instanceCols = Seq("session_id", "atc_ts")

  // deterministic 20% session sample (md5, the engine's sampling rule)
  // keeps the spec's training wall bounded; evaluation is full-valid.
  private def trainSampleRaw: DataFrame =
    spark.read.parquet(trainPath)
      .filter(expr("conv(substring(md5(session_id), 1, 4), 16, 10) % 5 = 0"))

  private lazy val trainAsm =
    Ranker.assemble(trainSampleRaw, Ranker.screenedFeatures).localCheckpoint(true)

  private lazy val model = Ranker.train(trainAsm, maxIter = 8, maxDepth = 5)

  private lazy val scoredValid = Ranker
    .score(model,
      Ranker.assemble(spark.read.parquet(validPath), Ranker.screenedFeatures))
    .select(col("session_id"), col("atc_ts"), col("category_id"), col("y"), col("p1"))
    .localCheckpoint(true)

  test("signal screen detects the artifact's user-history target leak") {
    // exact pins: both artifacts are immutable and the screen is exact
    // integer rank math — these are constants of the reference's data.
    def screen(p: String): Map[String, Long] =
      Eval.labelSignalAucPpm(spark.read.parquet(p), Ranker.baseFeatures, "y")
        .collect()
        .map(r => r.getAs[String]("feature") -> r.getAs[Long]("auc_ppm"))
        .toMap
    val tr = screen(trainPath)
    val va = screen(validPath)
    assert(tr("user_cat_hist") == 923017L && va("user_cat_hist") == 504189L)
    assert(tr("log_user_cat_hist") == 923017L && va("log_user_cat_hist") == 504189L)
    assert(tr("user_cat_sessions") == 895512L && va("user_cat_sessions") == 504085L)
    // the leak signature: train/valid signal drift > 0.3 AUC for the
    // user-history family, < 0.05 for every honest feature
    Ranker.baseFeatures.foreach { f =>
      val drift = math.abs(tr(f) - va(f))
      if (Ranker.leakyFeatures(f))
        assert(drift > 300000L, s"$f drift $drift — leak signature lost")
      else
        assert(drift < 50000L, s"$f drift $drift — new inconsistency?")
    }
    // the honest features survive with real signal on BOTH splits
    assert(va("cat_share_in_prefix") > 900000L)
    assert(va("cat_count_in_prefix") > 900000L)
  }

  test("fixed-seed retrain is bit-identical in-session") {
    val again = Ranker.train(trainAsm, maxIter = 8, maxDepth = 5)
    assert(model.featureImportances == again.featureImportances)
    // toDebugString embeds the random model uid — strip it before the
    // structural comparison
    def shape(m: org.apache.spark.ml.classification.GBTClassificationModel) =
      m.trees.map(_.toDebugString.replaceAll("uid=\\w+", "uid=_")).toSeq
    assert(shape(model) == shape(again))
  }

  test("feature importances: normalized, spread beyond one feature") {
    val imp = model.featureImportances.toArray
    assert(math.abs(imp.sum - 1.0) < 1e-9)
    assert(imp.count(_ > 0.0) >= 5, "a real ensemble splits on >1 signal")
    val byName = Ranker.screenedFeatures.zip(imp).toMap
    assert(byName("cat_count_in_prefix") + byName("cat_share_in_prefix") > 0.05,
      "the prefix-count family must carry weight")
  }

  test("screened model: valid AUC far above the no-skill floor") {
    val auc = Eval.aucPpm(scoredValid, col("p1"), "y")
      .head().getAs[Long]("auc_ppm")
    // measured 975002 ppm at the suite's partitioning; floor loose so
    // solver-precision drift across Spark versions can't flake it
    assert(auc > 900000L, s"screened valid AUC $auc ppm")
  }

  test("golden Recall@20 under the GBT ranking (README.md:217)") {
    val pool = Eval.poolRecallPpm(scoredValid, instanceCols, "y")
      .head().getAs[Long]("recall_ppm")
    val at20 = Eval.recallAtKPpm(
      scoredValid, instanceCols, "y", col("p1"), Seq("category_id"), k = 20)
      .head().getAs[Long]("recall_ppm")
    val popularity20 = Eval.recallAtKPpm(
      spark.read.parquet(validPath), instanceCols, "y",
      col("cat_popularity"), Seq("category_id"), k = 20)
      .head().getAs[Long]("recall_ppm")
    // recall@20 is capped by pool recall (893468 ppm, pinned in
    // GoldenParitySpec); the trained ranker must recover nearly all of
    // the pool's hits within 20 of ~33 candidates (measured 878932 =
    // 98.4% of the ceiling) and crush the popularity baseline
    // (233760 ppm measured)
    assert(at20 <= pool)
    assert(at20 > 800000L, s"GBT recall@20 $at20 ppm below 80%")
    assert(at20 > popularity20 * 2,
      s"GBT recall@20 $at20 must dominate popularity baseline $popularity20")
  }

  test("time-aware hyperparameter sweep (README.md:276): deterministic winner, no AUC regression") {
    val grid = Seq((3, 4), (5, 4), (5, 8))
    val (points, best) = Ranker.timeAwareSweep(
      trainSampleRaw, Ranker.screenedFeatures, "atc_ts",
      grid, embargoSec = 1800L)
    assert(points.map(p => (p.maxDepth, p.maxIter)) == grid, "one point per config")
    points.foreach(p => assert(p.validAucPpm > 500000L,
      s"config $p below no-skill on the time holdout"))
    info(s"sweep: $points -> winner $best")
    // fixed-seed reproducibility of the CHOSEN config: re-measuring
    // just the winner reproduces its holdout AUC bit-exactly
    val (again, _) = Ranker.timeAwareSweep(
      trainSampleRaw, Ranker.screenedFeatures, "atc_ts",
      Seq((best.maxDepth, best.maxIter)), embargoSec = 1800L)
    assert(again.head.validAucPpm == best.validAucPpm,
      s"winner AUC not reproducible: ${again.head} vs $best")
    // the chosen config, retrained on the full (sampled) train window,
    // holds the screened model's valid-AUC floor — tuning must never
    // regress the fixed-param head
    val tuned = Ranker.train(trainAsm, maxIter = best.maxIter, maxDepth = best.maxDepth)
    val tunedAuc = Eval.aucPpm(
      Ranker.score(tuned,
        Ranker.assemble(spark.read.parquet(validPath), Ranker.screenedFeatures)),
      col("p1"), "y").head().getAs[Long]("auc_ppm")
    info(s"tuned valid AUC = $tunedAuc ppm")
    assert(tunedAuc > 900000L, s"tuned valid AUC $tunedAuc ppm below floor")
  }

  test("champion selection (README.md:272-275): two families, same split, deterministic winner") {
    val gbtGrid = Seq((5, 8))
    val lrGrid = Seq(0.01)
    val (points, champion) = Ranker.championSelect(
      trainSampleRaw, Ranker.screenedFeatures, "atc_ts",
      instanceCols, "category_id",
      gbtGrid, lrGrid, recallK = 20, embargoSec = 1800L)
    assert(points.map(_.family) == Seq("gbt", "lr"), "one point per family point")
    points.foreach { p =>
      assert(p.validAucPpm > 500000L && p.validAucPpm <= 1000000L,
        s"family $p below no-skill on the shared time holdout")
      assert(p.recallPpm >= 0L && p.recallPpm <= 1000000L, s"recall out of range: $p")
    }
    // champion = exact argmax with the documented tie-break
    val expected = points.sortBy(p => (-p.validAucPpm, p.family, p.params)).head
    assert(champion == expected, s"champion $champion != argmax $expected")
    info(s"championship: $points -> $champion")
    // deterministic: the full report reproduces bit-exactly (fixed
    // seed, shared checkpointed split, exact-integer metrics)
    val (again, championAgain) = Ranker.championSelect(
      trainSampleRaw, Ranker.screenedFeatures, "atc_ts",
      instanceCols, "category_id",
      gbtGrid, lrGrid, recallK = 20, embargoSec = 1800L)
    assert(again == points && championAgain == champion,
      s"championship not reproducible: $again vs $points")
  }

  test("model contrast: feeding the leak inverts generalization") {
    val allFeatures = Ranker.baseFeatures ++ Ranker.embFeatures
    val leakyModel = Ranker.train(
      Ranker.assemble(trainSampleRaw, allFeatures).localCheckpoint(true),
      maxIter = 8, maxDepth = 5)
    val leakyScored = Ranker.score(
      leakyModel,
      Ranker.assemble(spark.read.parquet(validPath), allFeatures))
    val leakyAuc = Eval.aucPpm(leakyScored, col("p1"), "y")
      .head().getAs[Long]("auc_ppm")
    val cleanAuc = Eval.aucPpm(scoredValid, col("p1"), "y")
      .head().getAs[Long]("auc_ppm")
    // measured: 340515 (leaky) vs 975002 (screened) — the leaked
    // features don't just waste splits, they ANTI-generalize (the
    // model ranks train-window repeat behavior that reverses across
    // the split boundary). Demand a wide gap, not the exact values.
    assert(cleanAuc - leakyAuc > 300000L,
      s"leak contrast collapsed: clean=$cleanAuc leaky=$leakyAuc")
  }
}

package graft

import graft.ops.Eval
import org.apache.spark.sql.functions._

/** Unit semantics of the ranking/calibration eval operators on crafted
  * fixtures with hand-computed answers (the golden-artifact and q298/
  * q299/q300 oracle rows cover them at data scale).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rankingEvalPpm: recall@5 and MRR@10 with hand-computed ranks") {
    // instance A: positive at rank 3 (hit@5, rr = 1/3)
    // instance B: positive at rank 7 (miss@5, rr = 1/7)
    val rows =
      (1 to 10).map(i => ("a", i.toLong, 100L - i, if (i == 3) 1L else 0L)) ++
        (1 to 10).map(i => ("b", i.toLong, 100L - i, if (i == 7) 1L else 0L))
    val df = rows.toDF("inst", "item", "score", "y")
    val r = Eval.rankingEvalPpm(
      df, Seq("inst"), "y", col("score"), Seq("item"), recallK = 5, mrrK = 10)
      .head()
    assert(r.getAs[Long]("n_instances") == 2L)
    assert(r.getAs[Long]("n_hit_at5") == 1L)
    assert(r.getAs[Long]("recall5_ppm") == 500000L)
    // (1000000 div 3 + 1000000 div 7) div 2 = (333333 + 142857) div 2
    assert(r.getAs[Long]("mrr10_ppm") == 238095L)
  }

  test("rankingEvalPpm: positive below mrrK contributes 0") {
    val rows = (1 to 15).map(i => ("a", i.toLong, 100L - i, if (i == 12) 1L else 0L))
    val r = Eval.rankingEvalPpm(
      rows.toDF("inst", "item", "score", "y"),
      Seq("inst"), "y", col("score"), Seq("item"), recallK = 5, mrrK = 10)
      .head()
    assert(r.getAs[Long]("n_hit_at5") == 0L && r.getAs[Long]("mrr10_ppm") == 0L)
  }

  test("calibrationBins: bin clamp, means, gaps") {
    // conf 1e6 lands in the LAST bin (clamp), not a phantom bin 10
    val df = Seq(
      (1000000L, 1L), (950000L, 1L), // bin 9: conf_avg 975000, acc 1e6
      (50000L, 0L), (150000L, 1L) // bins 0 and 1
    ).toDF("conf_ppm", "y")
    val bins = Eval.calibrationBins(df, col("conf_ppm"), "y", 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("conf_avg_ppm"),
          r.getAs[Long]("acc_ppm"), r.getAs[Long]("gap_ppm"))).toMap
    assert(bins.keySet == Set(0L, 1L, 9L))
    assert(bins(9L) == ((2L, 975000L, 1000000L, 25000L)))
    assert(bins(0L) == ((1L, 50000L, 0L, 50000L)))
    assert(bins(1L) == ((1L, 150000L, 1000000L, 850000L)))
  }

  test("labelSignalAucPpm: perfect / inverted / constant / null features") {
    val df = Seq(
      (1L, Some(10L), Some(1L), None: Option[Long]),
      (1L, Some(9L), Some(2L), Some(1L)),
      (0L, Some(2L), Some(9L), Some(1L)),
      (0L, Some(1L), Some(10L), Some(1L))
    ).toDF("y", "perfect", "inverted", "constant")
    val m = Eval.labelSignalAucPpm(df, Seq("perfect", "inverted", "constant"), "y")
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("auc_ppm"), r.getAs[Long]("n_null"))).toMap
    assert(m("perfect") == ((1000000L, 0L)))
    assert(m("inverted") == ((0L, 0L)))
    // all-tied score: average ranks make AUC exactly 1/2; one null excluded
    assert(m("constant") == ((500000L, 1L)))
  }

  test("labelSignalAucPpm: an ALL-null feature still appears in the screen") {
    // a fully-broken (all-null) feature is exactly the one the screen
    // must surface — it has no rows in the AUC branch, so a left join
    // from that branch would silently drop it (full-outer regression pin)
    val df = Seq(
      (1L, Some(10L), None: Option[Long]),
      (0L, Some(2L), None: Option[Long]),
      (0L, Some(1L), None: Option[Long])
    ).toDF("y", "ok", "broken")
    val rows = Eval.labelSignalAucPpm(df, Seq("ok", "broken"), "y")
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(rows.keySet == Set("ok", "broken"))
    val b = rows("broken")
    assert(b.getAs[Long]("n_pos") == 0L && b.getAs[Long]("n_neg") == 0L)
    assert(b.isNullAt(b.fieldIndex("auc_ppm")))
    assert(b.getAs[Long]("n_null") == 3L)
  }

  test("calibrationBins: negative / out-of-range conf_ppm fails LOUD") {
    val df = Seq((-5L, 0L), (500000L, 1L)).toDF("conf_ppm", "y")
    val ex = intercept[Exception] {
      Eval.calibrationBins(df, col("conf_ppm"), "y", 10).collect()
    }
    assert(ex.getMessage != null)
  }
}

package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

/** Statistical parity against the reference's SHIPPED artifacts.
  *
  * The reference repo ships its real pipeline outputs
  * (`/root/reference/data/processed/X_{train,valid}_spark.parquet`) and
  * the executed notebook records their statistics
  * (`prepare_training_data_pyspark_en.ipynb`, STEP 8 "Verify output
  * Data"): 970,995 / 551,775 rows, the label split 944,447+26,548 /
  * 536,450+15,325, and `describe()` over six key features. This spec
  * reads those artifacts through the ENGINE'S OWN readers and profiler
  * (`Profile.profile`, the q92 operator; the q14 label-stats shape) and
  * asserts the published numbers — the last reference-fidelity check
  * possible without the raw Kaggle CSVs: it fails if our parquet
  * reader, aggregation, or profiling semantics diverge from what the
  * reference's own Spark wrote.
  */
class GoldenParitySpec extends SparkSpec {

  private val trainPath = "/root/reference/data/processed/X_train_spark.parquet"
  private val validPath = "/root/reference/data/processed/X_valid_spark.parquet"

  private lazy val train = spark.read.parquet(trainPath)
  private lazy val valid = spark.read.parquet(validPath)

  private def relClose(actual: Double, expected: Double, tol: Double = 1e-9): Boolean =
    math.abs(actual - expected) <= tol * math.max(1.0, math.abs(expected))

  test("artifact row counts match the notebook (970,995 / 551,775)") {
    assert(train.count() == 970995L)
    assert(valid.count() == 551775L)
  }

  test("label distribution matches the notebook's groupBy('y').count()") {
    // engine-side: the q14 label-stats shape (groupBy label, count)
    def labelCounts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.groupBy(col("y")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(labelCounts(train) == Map(0 -> 944447L, 1 -> 26548L))
    assert(labelCounts(valid) == Map(0 -> 536450L, 1 -> 15325L))
    // label balance from BASELINE.md: 2.73% / 2.78% (notebook rounding)
    assert(math.abs(26548.0 / 970995.0 - 0.0273) < 5e-4)
    assert(math.abs(15325.0 / 551775.0 - 0.0278) < 5e-4)
  }

  test("describe() parity: mean/stddev/min/max of the six key features") {
    // Notebook STEP 8 summary table (sample stddev, like describe()).
    // (col, mean, stddev, min, max)
    val expected = Seq(
      ("n_prefix_items", 5.988889747115072, 12.811402174604046, 0L, 206L),
      ("n_prefix_events", 9.89517762707326, 22.479989020302163, 0L, 352L),
      ("cat_count_in_prefix", 0.22531526938861682, 1.5317604295367397, 0L, 115L),
      ("cat_popularity", 9933.275662593525, 8259.57777523644, 2L, 29507L),
      ("user_cat_hist", 1.7070839705662748, 6.0357641114836635, 0L, 186L),
      ("recency_sec", 924582.5699380533, 263608.47561874427, 1L, 999999L))
    val aggs = expected.flatMap { case (c, _, _, _, _) =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        avg(col(c)).as(s"${c}__mean"),
        stddev_samp(col(c)).as(s"${c}__sd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    expected.foreach { case (c, mean, sd, mn, mx) =>
      assert(row.getAs[Long](s"${c}__n") == 970995L, s"$c count")
      assert(relClose(row.getAs[Double](s"${c}__mean"), mean), s"$c mean")
      assert(relClose(row.getAs[Double](s"${c}__sd"), sd), s"$c stddev")
      assert(row.getAs[Long](s"${c}__min") == mn, s"$c min")
      assert(row.getAs[Long](s"${c}__max") == mx, s"$c max")
    }
  }

  test("engine profiler (q92 operator) agrees with the artifact's ranges") {
    val prof = Profile
      .profile(train, Seq("n_prefix_items", "recency_sec", "y"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val items = prof("n_prefix_items")
    assert(items.getAs[Long]("n_nonnull") == 970995L)
    assert(items.getAs[String]("min_value") == "0")
    assert(items.getAs[String]("max_value") == "206")
    val rec = prof("recency_sec")
    assert(rec.getAs[String]("min_value") == "1")
    assert(rec.getAs[String]("max_value") == "999999")
    val y = prof("y")
    assert(y.getAs[Long]("n_distinct") == 2L)
  }

  test("valid artifact schema is identical to train (38 columns)") {
    assert(train.columns.length == 38)
    assert(
      valid.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        train.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("candidate-pool recall of the shipped artifacts (README.md:217,244)") {
    // The engine's recall operator (the q116 shape: instance-grain
    // max(label) → one exchange) run over the REAL artifact. Each
    // (session_id, atc_ts) prediction instance is a candidate pool of
    // ~33 categories; pool recall is the share whose true category the
    // 4-strategy generator retrieved at all. Pinned to the exact
    // measured ppm — the artifact is fixed, so these are constants:
    // train 906935 ppm (25,893/28,550), valid 893468 ppm
    // (14,937/16,718). The README's "95%+ recall" (README.md:244) is
    // the strategy-combination design point; the shipped pool measures
    // 90.7%/89.3% — the delta is the reference's, faithfully
    // reproduced, not ours. Recall@20 under a TRAINED ranking is
    // RankerSpec's golden test.
    def pin(df: org.apache.spark.sql.DataFrame, inst: Long, hit: Long, ppm: Long) = {
      val r = graft.ops.Eval
        .poolRecallPpm(df, Seq("session_id", "atc_ts"), "y").head()
      assert(r.getAs[Long]("n_instances") == inst)
      assert(r.getAs[Long]("n_hit") == hit)
      assert(r.getAs[Long]("recall_ppm") == ppm)
    }
    pin(train, 28550L, 25893L, 906935L)
    pin(valid, 16718L, 14937L, 893468L)
  }

  test("point-in-time discipline holds in the shipped artifacts") {
    // Train window ends where valid begins (half-open): max(train.atc_ts)
    // < min(valid.atc_ts) proves the shipped split is leak-free and our
    // timestamp reader orders it correctly.
    val trainMax = train.agg(max(col("atc_ts"))).head().getTimestamp(0)
    val validMin = valid.agg(min(col("atc_ts"))).head().getTimestamp(0)
    assert(trainMax.before(validMin))
  }
}

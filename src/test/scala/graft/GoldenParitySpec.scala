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

  test("full 38-column parity: notebook schema + describe() of every column (VERDICT r14 item 5)") {
    // Schema exactly as cell 24 prints it (names, types, order).
    val expectedSchema = Seq(
      ("session_id", "string"), ("atc_ts", "timestamp"), ("category_id", "bigint"),
      ("n_prefix_items", "bigint"), ("n_prefix_events", "bigint"),
      ("cat_count_in_prefix", "bigint"), ("cat_share_in_prefix", "double"),
      ("recency_sec", "bigint"), ("log_recency", "double"), ("hour_of_day", "int"),
      ("day_of_week", "int"), ("is_weekend", "int"), ("time_since_session_start", "bigint"),
      ("session_cat_diversity", "bigint"), ("cat_popularity", "bigint"),
      ("log_cat_pop", "double"), ("user_cat_hist", "bigint"), ("log_user_cat_hist", "double"),
      ("user_cat_sessions", "bigint"), ("user_total_sessions", "bigint"),
      ("user_avg_session_dur", "double"), ("y", "int")) ++
      (0 until 16).map(i => (s"cat_emb_$i", "float"))
    assert(
      train.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq == expectedSchema,
      "train schema must match the notebook's printed 38-column schema verbatim")

    // Full describe() over every numeric column. Cell 24 prints the
    // stats table for six features only (pinned in the test above with
    // the notebook's own digits); the remaining 30 columns are pinned to
    // constants computed ONCE from the shipped artifact with an
    // independent engine (DuckDB) — a reader/aggregation-semantics
    // regression pin over the reference's real output, the strongest
    // check available where the notebook printed no digits.
    // (col, mean, stddev_samp, min, max) — count is 970,995 everywhere.
    val expected = Seq(
      ("category_id", 884.311520656646, 510.59943307045074, 0.0, 1697.0),
      ("n_prefix_items", 5.988889747115072, 12.81140217460407, 0.0, 206.0),
      ("n_prefix_events", 9.89517762707326, 22.479989020302302, 0.0, 352.0),
      ("cat_count_in_prefix", 0.22531526938861682, 1.5317604295367433, 0.0, 115.0),
      ("cat_share_in_prefix", 0.026727579588976966, 0.14321801240910698, 0.0, 1.0),
      ("recency_sec", 924582.5699380533, 263608.4756187444, 1.0, 999999.0),
      ("log_recency", 13.273224112569002, 1.9813753355160033, 0.6931471805599453, 13.815510557964274),
      ("hour_of_day", 14.149830843619174, 6.215160083211317, 0.0, 23.0),
      ("day_of_week", 3.8330300361999803, 1.8319104163371882, 1.0, 7.0),
      ("is_weekend", 0.2045345238646955, 0.4033612772348716, 0.0, 1.0),
      ("time_since_session_start", 1351.4617964047188, 3171.0769957397492, 0.0, 43479.0),
      ("session_cat_diversity", 3.3143579524096416, 6.924542620189081, 0.0, 86.0),
      ("cat_popularity", 9933.275662593525, 8259.577775236416, 2.0, 29507.0),
      ("log_cat_pop", 8.701361624294956, 1.218048694020033, 1.0986122886681096, 10.292416692004194),
      ("user_cat_hist", 1.7070839705662748, 6.035764111483636, 0.0, 186.0),
      ("log_user_cat_hist", 0.35965508294422804, 0.8293436195157213, 0.0, 5.231108616854587),
      ("user_cat_sessions", 0.6120649436917801, 1.9169358775515393, 0.0, 75.0),
      ("user_total_sessions", 11.919911019109264, 28.434840631371383, 1.0, 215.0),
      ("user_avg_session_dur", 1501.2907686479718, 2578.2969124196666, 0.0, 43704.0),
      ("y", 0.027341026472844865, 0.16307520391575286, 0.0, 1.0),
      ("cat_emb_0", -0.38451943201565925, 0.7077828159282414, -2.9559454917907715, 1.4880927801132202),
      ("cat_emb_1", 0.4137981969138278, 0.8191421865333494, -2.1555187702178955, 2.383802890777588),
      ("cat_emb_2", 0.6122514281731917, 0.6612884577229996, -1.203304409980774, 2.981325626373291),
      ("cat_emb_3", -0.025863469098698404, 0.769111570295448, -2.519146680831909, 2.5436012744903564),
      ("cat_emb_4", 1.4182518134987843, 0.5843847187863618, -0.7686179876327515, 3.699561357498169),
      ("cat_emb_5", -0.5262685074730218, 0.6625156609447221, -3.048701047897339, 2.0237035751342773),
      ("cat_emb_6", -0.49932317344680865, 0.6945275003790979, -3.409677505493164, 1.7654556035995483),
      ("cat_emb_7", -0.11043150827855143, 0.5796836711015132, -2.0354726314544678, 2.5319485664367676),
      ("cat_emb_8", -0.21788318675794469, 0.6123106146569469, -2.891584873199463, 1.6643223762512207),
      ("cat_emb_9", -0.0004339275633618608, 0.748654021253953, -2.137333393096924, 3.2185897827148438),
      ("cat_emb_10", -0.018045462197098572, 0.6005468691681161, -2.1159849166870117, 2.132092237472534),
      ("cat_emb_11", -0.5222705601908274, 0.6925178862565373, -3.324089527130127, 1.366544246673584),
      ("cat_emb_12", -0.7261078865728974, 0.6726937019088599, -2.8502962589263916, 1.9789345264434814),
      ("cat_emb_13", -0.11421196728653765, 0.7629028898829814, -2.6965930461883545, 3.108412981033325),
      ("cat_emb_14", -0.9852262166899749, 0.6864234386048431, -4.62537956237793, 0.3700163960456848),
      ("cat_emb_15", 0.4188587191258311, 0.6149916160791252, -2.2744297981262207, 2.5523955821990967))
    val aggs = expected.flatMap { case (c, _, _, _, _) =>
      val d = col(c).cast("double")
      Seq(
        count(d).as(s"${c}__n"),
        avg(d).as(s"${c}__mean"),
        stddev_samp(d).as(s"${c}__sd"),
        min(d).as(s"${c}__min"),
        max(d).as(s"${c}__max"))
    } ++ Seq(
      // the two non-numeric columns: pinned non-null counts
      count(col("session_id")).as("session_id__n"),
      count(col("atc_ts")).as("atc_ts__n"))
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    expected.foreach { case (c, mean, sd, mn, mx) =>
      assert(row.getAs[Long](s"${c}__n") == 970995L, s"$c count")
      assert(relClose(row.getAs[Double](s"${c}__mean"), mean), s"$c mean")
      assert(relClose(row.getAs[Double](s"${c}__sd"), sd), s"$c stddev")
      assert(row.getAs[Double](s"${c}__min") == mn, s"$c min")
      assert(row.getAs[Double](s"${c}__max") == mx, s"$c max")
    }
    assert(row.getAs[Long]("session_id__n") == 970995L)
    assert(row.getAs[Long]("atc_ts__n") == 970995L)
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

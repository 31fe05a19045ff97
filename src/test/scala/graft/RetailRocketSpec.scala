package graft

import graft.pipeline.RetailRocket
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden end-to-end test of the RetailRocket-shape pipeline on a
  * hand-computed CSV fixture (FIXTURES.md §1/§3/§4): CSV scans with
  * explicit schemas, gap-rule boundary (exactly 1800 s stays), latest
  * category wins, half-open point-in-time split, candidate union,
  * exact 38-column output schema, label correctness.
  */
class RetailRocketSpec extends SparkSpec {
  import spark.implicits._

  // 2015-05-02 10:00:00 UTC (train window) / 2015-07-05 00:00:00 (valid)
  private val t0 = 1430560800L
  private val t1 = 1436054400L

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("rr-fixture")
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    // events.csv: user 1 = two-session run with an in-train ATC;
    // user 2 = valid-window ATC; user 3 = exact-1800s boundary pair.
    write("events.csv",
      Seq("timestamp,visitorid,event,itemid,transactionid") ++ Seq(
        s"${t0 * 1000},1,view,101,",
        s"${(t0 + 600) * 1000},1,addtocart,102,",
        s"${(t0 + 600 + 1801) * 1000},1,view,103,", // new session (gap 1801)
        s"${t1 * 1000},2,view,101,",
        s"${(t1 + 100) * 1000},2,addtocart,101,",
        s"${t0 * 1000},3,view,101,",
        s"${(t0 + 1800) * 1000},3,view,102,")) // gap == 1800: SAME session
    // item 101: categoryid changes 10 -> 11 (latest wins, split across parts)
    write("item_properties_part1.csv",
      Seq("timestamp,itemid,property,value") ++ Seq(
        s"${(t0 - 86400) * 1000},101,categoryid,10",
        s"${(t0 - 86400) * 1000},102,categoryid,20",
        s"${(t0 - 86400) * 1000},101,available,1")) // non-category prop dropped
    write("item_properties_part2.csv",
      Seq("timestamp,itemid,property,value") ++ Seq(
        s"${(t0 - 3600) * 1000},101,categoryid,11")) // later snapshot wins
    dir.toString
  }

  private lazy val rawEvents = RetailRocket.readEventsCsv(spark, s"$fixtureDir/events.csv")
  private lazy val rawProps = RetailRocket.readPropsCsv(
    spark,
    Seq(s"$fixtureDir/item_properties_part1.csv", s"$fixtureDir/item_properties_part2.csv"))
  private lazy val result = RetailRocket.buildAll(spark, rawEvents, rawProps)

  test("sessionization: gap rule incl. exact-1800 boundary") {
    val sessions = RetailRocket
      .sessionizeEvents(rawEvents)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("session_id")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("inferSchema passthrough: same rows and compatible types as the explicit schema") {
    val inferred = RetailRocket.readEventsCsv(spark, s"$fixtureDir/events.csv", inferSchema = true)
    assert(inferred.count() == rawEvents.count())
    // downstream contract holds regardless of which reader fed it
    val s1 = RetailRocket.sessionizeEvents(inferred).orderBy("session_id", "ts", "item_id")
    val s2 = RetailRocket.sessionizeEvents(rawEvents).orderBy("session_id", "ts", "item_id")
    assert(s1.collect().toSeq == s2.collect().toSeq)
    val props = RetailRocket.readPropsCsv(
      spark, Seq(s"$fixtureDir/item_properties_part1.csv"), inferSchema = true)
    assert(props.count() > 0)
  }

  test("item category: latest snapshot wins across csv parts") {
    val cats = RetailRocket.itemCategory(rawProps)
      .as[(Long, Long)].collect().toMap
    assert(cats == Map(101L -> 11L, 102L -> 20L)) // 101: 10 superseded by 11
  }

  test("ATC split: half-open train/valid windows") {
    val events = RetailRocket.sessionizeEvents(rawEvents)
    val itemCat = RetailRocket.itemCategory(rawProps)
    val atc = RetailRocket.atcEvents(events, itemCat)
    val train = RetailRocket.splitByWindow(atc, RetailRocket.TrainStart, RetailRocket.TrainEnd)
    val valid = RetailRocket.splitByWindow(atc, RetailRocket.TrainEnd, RetailRocket.ValidEnd)
    assert(train.count() == 1 && valid.count() == 1)
    assert(train.select("category_id").as[Long].head() == 20L) // item 102
    assert(valid.select("category_id").as[Long].head() == 11L) // item 101, latest cat
  }

  test("golden: exact 38-column schema (FIXTURES.md §3)") {
    val expected = Seq(
      "session_id", "atc_ts", "category_id",
      "n_prefix_items", "n_prefix_events", "cat_count_in_prefix",
      "cat_share_in_prefix", "recency_sec", "log_recency",
      "hour_of_day", "day_of_week", "is_weekend",
      "time_since_session_start", "session_cat_diversity",
      "cat_popularity", "log_cat_pop",
      "user_cat_hist", "log_user_cat_hist", "user_cat_sessions",
      "user_total_sessions", "user_avg_session_dur", "y") ++
      (0 until 16).map(i => s"cat_emb_$i")
    assert(result.train.columns.toSeq == expected)
    assert(result.valid.columns.toSeq == expected)
    val t = result.train.schema
    assert(t("session_id").dataType.typeName == "string")
    assert(t("atc_ts").dataType.typeName == "timestamp")
    assert(t("cat_share_in_prefix").dataType.typeName == "double")
    assert(t("cat_emb_0").dataType.typeName == "float")
  }

  test("golden: schema matches the reference's shipped parquet artifact") {
    // The reference ships its real outputs (data/processed/X_train_spark
    // .parquet, 970,995 rows — BASELINE.md). Our pipeline must produce
    // the identical column names, order, and types.
    val ref = spark.read.parquet("/root/reference/data/processed/X_train_spark.parquet")
    val refFields = ref.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
    val ourFields = result.train.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
    assert(ourFields == refFields)
  }

  test("golden: hand-computed train rows") {
    // Train anchor = user 1's ATC (cat 20). Candidates: prefix {11},
    // popularity {11, 20} (covis/userhist below thresholds or merged).
    val rows = result.train
      .select("category_id", "n_prefix_events", "cat_count_in_prefix", "recency_sec", "y")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(11L, 20L))
    val (c11, c20) = (rows(0), rows(1))
    assert(c11 == ((11L, 1L, 1L, 600L, 0))) // prefix = view of item 101 600 s earlier
    assert(c20 == ((20L, 1L, 0L, 999999L, 1))) // true category, never in prefix
  }

  test("golden: valid rows are point-in-time w.r.t. the train cutoff") {
    // Valid anchor = user 2's ATC of item 101 (cat 11): prefix {11},
    // popularity from TRAIN-window events only {11, 20}.
    val rows = result.valid
      .select("category_id", "y", "user_total_sessions")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(11L, 20L))
    assert(rows.find(_._1 == 11L).get._2 == 1)
    // user 2 has NO sessions before the cutoff -> default 0, not leakage
    assert(rows.forall(_._3 == 0L))
  }

  test("run: file-level entry writes both matrices with expected counts") {
    val out = Files.createTempDirectory("rr-out").toString
    val counts = RetailRocket.run(
      spark,
      s"$fixtureDir/events.csv",
      Seq(s"$fixtureDir/item_properties_part1.csv", s"$fixtureDir/item_properties_part2.csv"),
      out)
    assert(counts("train_rows") == 2L && counts("valid_rows") == 2L)
    assert(counts("train_positive") == 1L && counts("valid_positive") == 1L)
    val train = spark.read.parquet(s"$out/X_train_spark.parquet")
    assert(train.count() == 2L && train.columns.length == 38)
  }

  test("maxPrefixEvents cap: output schema/rows survive, capped run is a subset-or-equal") {
    val capped = RetailRocket.buildAll(spark, rawEvents, rawProps, maxPrefixEvents = Some(2))
    val full = result
    assert(capped.train.columns.toSeq == full.train.columns.toSeq)
    // candidate sets can only shrink when the prefix shrinks
    val cappedKeys = capped.train.select("session_id", "atc_ts", "category_id")
      .collect().toSet
    val fullKeys = full.train.select("session_id", "atc_ts", "category_id")
      .collect().toSet
    assert(cappedKeys.subsetOf(fullKeys))
    // prefix-derived counts bounded by the cap
    assert(capped.train.agg(max(col("n_prefix_events"))).head().getLong(0) <= 2L)
  }

  test("golden: embeddings attached as 16 zero-filled dims (tiny vocab)") {
    // minCount=3 with a 2-token corpus -> empty vocab -> all dims 0.0
    val embSum = result.train
      .select((0 until 16).map(i => abs(col(s"cat_emb_$i"))).reduce(_ + _).as("s"))
      .agg(sum("s")).as[Double].head()
    assert(embSum == 0.0)
  }

  test("buildAll over a bucketed events table produces identical matrices") {
    try {
      val bucketed = RetailRocket.buildAll(
        spark, rawEvents, rawProps,
        bucketedEventsTable = Some("graft_rr_spec_bucketed"))
      // full-width check: every one of the 38 columns agrees on both splits
      def rows(df: org.apache.spark.sql.DataFrame) = {
        val cols = df.columns.sorted
        df.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq
      }
      assert(rows(bucketed.train) == rows(result.train))
      assert(rows(bucketed.valid) == rows(result.valid))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_rr_spec_bucketed")
    }
  }
}

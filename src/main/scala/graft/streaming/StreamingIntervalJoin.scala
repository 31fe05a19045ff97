package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Stream-STREAM event-time interval join — the continuous form of the
  * reference's J6 user-history attach (`prepare_training_data_pyspark
  * .py:349-353`, equi-key + time residual): each purchase joined to the
  * same user's clicks in the preceding lookback window, both sides
  * unbounded streams.
  *
  * Scale shape: unlike the stateless stream-static join
  * ([[StreamingEnrich]]), BOTH sides buffer in the state store here.
  * The event-time range condition must live in the JOIN condition (not
  * a post-filter) — that is what lets Spark derive a state watermark
  * per side and evict: clicks older than `click watermark + lookback`
  * and purchases older than their watermark can never match a future
  * row and are dropped. State is bounded by rate × (watermark +
  * lookback), independent of stream age — the property that makes the
  * join runnable forever at feed scale. Inner-join matches emit the
  * micro-batch they are found in (no held-back tail; watermarks bound
  * STATE, not emission, for inner joins).
  */
object StreamingIntervalJoin {

  /** (purchase, preceding click within `lookback`) pairs per user. */
  def clickPurchasePairs(
      clicks: DataFrame,
      purchases: DataFrame,
      lookback: String = "30 minutes",
      clickWatermark: String = "1 hour",
      purchaseWatermark: String = "30 minutes"): DataFrame = {
    val c = clicks
      .select(
        col("user_id").as("c_user"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", clickWatermark)
    val p = purchases
      .select(
        col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", purchaseWatermark)
    p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"interval $lookback"))
      .select(
        col("p_user").as("user_id"),
        col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** LEFT-OUTER form of [[clickPurchasePairs]]: every purchase emits —
    * matched pairs promptly (inner-join semantics), UNMATCHED purchases
    * with null click columns only once the state watermark proves no
    * qualifying click can still arrive (outer emission, unlike inner,
    * IS watermark-gated: the null row is produced at state eviction).
    * The continuous "organic conversions" feed: purchases with no paid
    * click in the preceding lookback window. Same bounded-state
    * property as the inner join — both sides evict by the derived
    * state watermark, so state is rate × (watermark + lookback)
    * regardless of stream age.
    */
  def clickPurchasePairsLeftOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      lookback: String = "30 minutes",
      clickWatermark: String = "1 hour",
      purchaseWatermark: String = "30 minutes"): DataFrame = {
    val c = clicks
      .select(
        col("user_id").as("c_user"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", clickWatermark)
    val p = purchases
      .select(
        col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", purchaseWatermark)
    p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"interval $lookback"),
        "leftOuter")
      .select(
        col("p_user").as("user_id"),
        col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** FULL-OUTER form of [[clickPurchasePairs]] — completes the interval
    * join family (inner q304, left-outer q309): matched pairs emit
    * promptly, UNMATCHED rows on EITHER side emit with nulls once the
    * state watermark proves no counterpart can still arrive. The new
    * signal vs left-outer is the unmatched-CLICK row — a click with no
    * purchase in the FOLLOWING lookback window ("browse, no buy"), the
    * curation feed for abandoned-intent sessions. Per-side eviction
    * bounds under the MIN multi-watermark policy: an unmatched
    * purchase closes at `p_ts < W` (any later click is ≥ W > p_ts, and
    * the condition needs c_ts ≤ p_ts); an unmatched click closes at
    * `c_ts + lookback < W` (its whole candidate purchase window is
    * below the watermark). Same rate × (watermark + lookback) state
    * bound as the other forms.
    */
  def clickPurchasePairsFullOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      lookback: String = "30 minutes",
      clickWatermark: String = "1 hour",
      purchaseWatermark: String = "30 minutes"): DataFrame = {
    val c = clicks
      .select(
        col("user_id").as("c_user"),
        col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", clickWatermark)
    val p = purchases
      .select(
        col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", purchaseWatermark)
    p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"interval $lookback"),
        "fullOuter")
      .select(
        // exactly one side is non-null on outer rows
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** CHAINED stateful topology — the q310 full-outer interval join
    * feeding a per-user tumbling-window attribution count in ONE
    * streaming query (two stateful operators). Purchase-grain input to
    * the window agg: matched pairs + watermark-closed organic
    * purchases; click-only ledger rows carry no purchase time and stay
    * the join's own output (q310). Per window: `n_attributed` matched
    * (purchase, click) pairs and `n_organic` purchases that closed with
    * no qualifying click.
    *
    * Watermark interplay (why this composes correctly): Spark's
    * multi-stateful watermark propagation (SPARK-42376) delays the
    * DOWNSTREAM aggregation's emission watermark by the join's own
    * eviction delay, so an organic purchase whose null row the join
    * emits `lookback` late still lands in an OPEN window — no
    * silently-dropped rows. Tumbling, not session, window: session
    * windows are unsupported downstream of another stateful operator.
    * State = join state (rate × (watermark + lookback)) + one window
    * agg row per open (user, window) — both watermark-evicted.
    * ProbeStreamSoak pins the ×100 state sizes and the zero-phantom /
    * zero-drop parity vs the batch twin (same function, batch frames).
    */
  def attributionWindowCounts(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 30,
      lookback: String = "30 minutes",
      clickWatermark: String = "1 hour",
      purchaseWatermark: String = "30 minutes"): DataFrame =
    clickPurchasePairsFullOuter(
      clicks, purchases, lookback, clickWatermark, purchaseWatermark)
      .filter(col("p_ts").isNotNull)
      .groupBy(
        col("user_id"),
        window(col("p_ts"), s"$windowMinutes minutes").as("w"))
      .agg(
        count(col("click_id")).as("n_attributed"),
        sum(when(col("click_id").isNull, 1L).otherwise(0L)).as("n_organic"))

  /** Bounded-run harness (the [[StreamingEnrich.runBounded]] pattern):
    * one events parquet drives BOTH stream sides (filtered by event
    * type) into an in-memory sink; returns the completed rows.
    */
  def runBounded(
      spark: SparkSession,
      parquetPath: String,
      name: String,
      lookback: String = "30 minutes",
      leftOuter: Boolean = false,
      fullOuter: Boolean = false): DataFrame = {
    val p = java.nio.file.Paths.get(parquetPath)
    val srcPath =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("stream-src")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
        d.toString
      } else parquetPath
    def side(eventType: String): DataFrame =
      StreamingSessions.eventStream(spark, srcPath)
        .filter(col("event_type") === eventType)
    val joined =
      if (fullOuter) clickPurchasePairsFullOuter(side("click"), side("purchase"), lookback)
      else if (leftOuter) clickPurchasePairsLeftOuter(side("click"), side("purchase"), lookback)
      else clickPurchasePairs(side("click"), side("purchase"), lookback)
    val q: StreamingQuery =
      joined.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
    q.awaitTermination()
    spark.table(name)
  }
}

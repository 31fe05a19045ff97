package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom-state streaming sessionization via `flatMapGroupsWithState`
  * — the exact gap-rule semantics of the batch sessionizer (strict
  * `gap > 1800 s` on floor-second epochs, so the ==1800 boundary stays
  * in-session), which `session_window` can't express precisely.
  *
  * State per user = the one open session (constant size); closed
  * sessions are emitted as soon as the closing event arrives, and
  * event-time timeouts flush sessions the watermark has passed. At
  * scale, state lives in the state store keyed by user — bounded by
  * active users, not history.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double, event_id: Long) {
    /** floor-second epoch, matching the batch sessionizer's
      * `unix_timestamp` gap arithmetic.
      */
    def epoch_s: Long = Math.floorDiv(ts.getTime, 1000L)
  }
  case class OpenSession(
      sessionNum: Long, startS: Long, lastS: Long, n: Long, valueSum: Double)
  case class SessionOut(
      user_id: Long,
      session_num: Long,
      session_start_s: Long,
      session_end_s: Long,
      n_events: Long,
      value_sum: Double)

  val GapSeconds = 1800L

  /** The state-transition function (public: unit-testable without a
    * stream). Events within one invocation are sorted by time;
    * cross-invocation order is guaranteed by the watermark.
    */
  def updateUser(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.sessionNum, s.startS, s.lastS, s.n, s.valueSum))
    }
    // unique tie-break (the engine's determinism rule): equal-epoch
    // events order by event_id, same as the batch sessionizer's window
    val sorted = events.toArray.sortBy(e => (e.epoch_s, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case None =>
          open = Some(OpenSession(1L, e.epoch_s, e.epoch_s, 1L, e.value))
        case Some(s) if e.epoch_s - s.lastS > GapSeconds =>
          closed += SessionOut(userId, s.sessionNum, s.startS, s.lastS, s.n, s.valueSum)
          open = Some(OpenSession(s.sessionNum + 1, e.epoch_s, e.epoch_s, 1L, e.value))
        case Some(s) =>
          open = Some(s.copy(
            lastS = math.max(s.lastS, e.epoch_s),
            n = s.n + 1,
            valueSum = s.valueSum + e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // flush once the watermark passes the session's close boundary
      state.setTimeoutTimestamp((s.lastS + GapSeconds) * 1000L)
    }
    closed.result().iterator
  }

  /** Bounded harness: run the stateful sessionizer over a parquet
    * events file into an in-memory sink (mirrors
    * [[StreamingSessions.runBounded]]).
    */
  def runBounded(spark: SparkSession, parquetPath: String, name: String): DataFrame = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(parquetPath)
    val srcPath =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("stateful-src")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
        d.toString
      } else parquetPath
    val src = StreamingSessions.eventStream(spark, srcPath)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .as[Ev]
    val q = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

package graft

import graft.ops.Windows
import graft.streaming.StatefulSessions
import org.apache.spark.sql.functions._

/** Parity of the flatMapGroupsWithState sessionizer with the batch
  * gap rule — including the exactly-1800 s boundary session_window
  * cannot express.
  */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("state transition: strict-gap rule incl. ==1800 boundary") {
    // drive the transition function directly (no stream needed)
    import StatefulSessions._
    val out = collection.mutable.Buffer[SessionOut]()
    val state = new TestGroupState[OpenSession]
    def ev(s: Long, v: Double, id: Long) = Ev(7L, new java.sql.Timestamp(s * 1000L), v, id)
    out ++= updateUser(7L, Iterator(
      ev(1000L, 1.0, 1L),
      ev(1000L + 1800L, 2.0, 2L), // == 1800: same session
      ev(1000L + 1800L + 1801L, 3.0, 3L)), state) // 1801: closes session 1
    assert(out.map(o => (o.session_num, o.n_events, o.value_sum)) == Seq((1L, 2L, 3.0)))
    assert(state.value.get.sessionNum == 2L && state.value.get.n == 1L)
  }

  test("equal-timestamp ties order by event_id regardless of arrival order") {
    import StatefulSessions._
    def ev(s: Long, v: Double, id: Long) = Ev(7L, new java.sql.Timestamp(s * 1000L), v, id)
    // three ties at t=1000 delivered in reverse-id order, then a closer
    val batch = Seq(
      ev(1000L, 30.0, 3L), ev(1000L, 10.0, 1L), ev(1000L, 20.0, 2L),
      ev(1000L + 1801L, 5.0, 4L))
    def run(evs: Seq[Ev]): (Seq[SessionOut], Option[OpenSession]) = {
      val st = new TestGroupState[OpenSession]
      (updateUser(7L, evs.iterator, st).toSeq, st.value)
    }
    val (closedA, openA) = run(batch)
    val (closedB, openB) = run(Seq(ev(1000L, 10.0, 1L), ev(1000L, 20.0, 2L),
      ev(1000L, 30.0, 3L), ev(1000L + 1801L, 5.0, 4L)))
    // identical output (incl. bit-identical double sum: same add order)
    assert(closedA == closedB && openA == openB)
    assert(closedA.map(o => (o.session_num, o.n_events, o.value_sum)) == Seq((1L, 3L, 60.0)))
  }

  test("bounded stream matches batch sessionization (subset + tail)") {
    val dir = sf("sf0.001")
    val streamed = StatefulSessions
      .runBounded(spark, s"$dir/events.parquet", "stateful_sessions_spec")
      .select(
        col("user_id"),
        col("session_start_s").as("start_s"),
        col("session_end_s").as("end_s"),
        col("n_events"))
      .cache()
    val batch = Windows
      .sessionize(graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id")))
      .groupBy(col("session_id"), col("user_id"))
      .agg(
        min(col("epoch_s")).as("start_s"),
        max(col("epoch_s")).as("end_s"),
        count(lit(1)).as("n_events"))
      .drop("session_id")
      .cache()

    val keys = Seq("user_id", "start_s", "end_s", "n_events")
    assert(streamed.count() > 0)
    assert(
      streamed.join(batch, keys, "left_semi").count() == streamed.count(),
      "stateful sessionizer emitted a session batch doesn't have")
    val maxTs = batch.agg(max(col("end_s"))).as[Long].head()
    val missingEarly = batch.join(streamed, keys, "left_anti")
      .filter(col("end_s") < maxTs - 3600L - 1800L).count()
    assert(missingEarly == 0, "non-tail session missing from stateful output")
  }
}

/** Minimal GroupState stub for driving the transition function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  private var timeout: Long = -1L
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = value = Some(s)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = timeout = d
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = timeout = t
  override def setTimeoutTimestamp(t: Long, add: String): Unit = timeout = t
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}

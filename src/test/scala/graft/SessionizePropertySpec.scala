package graft

import graft.ops.Windows
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based sessionization checks (SURVEY.md §5): for arbitrary
  * event streams, the gap rule's invariants hold — intra-session gaps
  * ≤ 30 min, inter-session gaps > 30 min, session count = Σ new-session
  * flags, and every session belongs to exactly one user. Uses plain
  * ScalaCheck generators with fixed seeds (deterministic CI).
  */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    nUsers <- Gen.choose(1, 4)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(
      n,
      for {
        u <- Gen.choose(1L, nUsers.toLong)
        // times cluster around the 1800 s boundary to stress the edge
        t <- Gen.oneOf(Gen.choose(0L, 4000L), Gen.oneOf(1799L, 1800L, 1801L, 3600L))
      } yield (u, t))
  } yield rows.zipWithIndex.map { case ((u, t), i) => (i.toLong, t, u) }

  test("gap-rule invariants hold for arbitrary event streams") {
    (1 to 15).foreach { i =>
      val rows = eventsGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = rows
        .toDF("event_id", "epoch", "user_id")
        .withColumn("ts", timestamp_seconds(col("epoch")))
      val s = Windows.sessionize(df).cache()

      // 1. flag sum == distinct session count
      val flags = s.agg(sum("is_new_session")).as[Long].head()
      val sessions = s.select("session_id").distinct().count()
      assert(flags == sessions, s"seed $i: flag sum $flags != sessions $sessions")

      // 2. no intra-session gap > 1800; no inter-session gap <= 1800
      assert(
        s.filter(col("is_new_session") === 0 && col("gap_s") > 1800).count() == 0,
        s"seed $i: intra-session gap above the threshold")
      assert(
        s.filter(col("is_new_session") === 1 && col("gap_s").isNotNull &&
          col("gap_s") <= 1800).count() == 0,
        s"seed $i: session split on a within-threshold gap")

      // 3. total events preserved; each session belongs to one user
      assert(s.count() == rows.length.toLong, s"seed $i: events lost")
      val multiUser = s.groupBy("session_id")
        .agg(countDistinct("user_id").as("nu"))
        .filter(col("nu") > 1).count()
      assert(multiUser == 0, s"seed $i: session spans users")
      s.unpersist()
    }
  }
}

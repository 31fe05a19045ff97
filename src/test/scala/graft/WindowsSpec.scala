package graft

import graft.ops.Windows
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, epoch_s, user_id); ts column built from epoch for realism
  private def events(rows: (Long, Long, Long)*) =
    rows.toSeq
      .toDF("event_id", "epoch", "user_id")
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .drop("epoch")

  test("sessionize: 30-min gap rule splits sessions, exactly-1800s stays") {
    val df = events(
      (1L, 1000L, 7L),
      (2L, 1000L + 1800L, 7L), // gap == 1800 s: SAME session (strict >)
      (3L, 1000L + 1800L + 1801L, 7L), // gap 1801 s: NEW session
      (4L, 500L, 8L)) // other user: own session
    val out = Windows.sessionize(df).select("event_id", "session_id").as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "7_1")
    assert(out(2L) == "7_1")
    assert(out(3L) == "7_2")
    assert(out(4L) == "8_1")
  }

  test("sessionize: session count equals sum of is_new_session flags") {
    val df = events(
      (1L, 0L, 1L), (2L, 100L, 1L), (3L, 10000L, 1L),
      (4L, 0L, 2L), (5L, 90000L, 2L), (6L, 90001L, 2L))
    val s = Windows.sessionize(df)
    val nSessions = s.select("session_id").distinct().count()
    val flagSum = s.agg(sum("is_new_session")).as[Long].head()
    assert(nSessions == 4L)
    assert(flagSum == nSessions)
  }

  test("sessionize: intra-session gaps <= 1800, inter-session > 1800") {
    val df = events(
      (1L, 0L, 1L), (2L, 1800L, 1L), (3L, 3601L, 1L), (4L, 3700L, 1L))
    val s = Windows.sessionize(df).cache()
    val intra = s.filter(col("is_new_session") === 0 && col("gap_s") > 1800).count()
    val inter = s.filter(col("is_new_session") === 1 &&
      col("gap_s").isNotNull && col("gap_s") <= 1800).count()
    assert(intra == 0)
    assert(inter == 0)
  }

  test("topKPerGroup: deterministic tie-break takes lowest tie column") {
    val df = Seq(
      ("g1", 10L, 5L), ("g1", 10L, 3L), ("g1", 9L, 1L),
      ("g2", 1L, 9L))
      .toDF("g", "score", "id")
    val top = Windows
      .topKPerGroup(df, Seq("g"), col("score"), Seq("id"), 2)
      .select("g", "id", "rn").as[(String, Long, Int)].collect().toSet
    assert(top == Set(("g1", 3L, 1), ("g1", 5L, 2), ("g2", 9L, 1)))
  }

  test("latestPerKey: one row per key, latest order value wins") {
    val df = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "ver", "v")
    val latest = Windows.latestPerKey(df, Seq("k"), col("ver"), Seq("v"))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(latest == Set((1L, "b"), (2L, "c")))
  }

  test("transitionCounts: next-item pairs per group, unique tie-break") {
    val df = Seq(
      // s1 ordered by (t, id): a(1,1) b(2,2) a(2,3) c(3,4)
      ("s1", 1L, 1L, "a"), ("s1", 2L, 2L, "b"), ("s1", 2L, 3L, "a"), ("s1", 3L, 4L, "c"),
      // s2: a -> c
      ("s2", 1L, 5L, "a"), ("s2", 2L, 6L, "c"))
      .toDF("sess", "t", "id", "item")
    val out = Windows
      .transitionCounts(df, "sess", Seq(col("t").asc, col("id").asc), "item")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 2L)))
  }

  test("transitionCounts: single-row groups emit nothing") {
    val df = Seq(("s1", 1L, 1L, "a")).toDF("sess", "t", "id", "item")
    assert(Windows.transitionCounts(df, "sess", Seq(col("t"), col("id")), "item").count() == 0)
  }

  test("trailingRangeAgg equals the naive interval self-join, ties share frames") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 120).map { i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("id", "k", "t", "v")
    val out = Windows
      .trailingRangeAgg(df, "k", "t", precedingRange = 10L,
        aggs = Seq((sum(col("v")), "w_sum"), (count(lit(1)), "w_n")))
      .select("id", "w_sum", "w_n").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // naive: for each row, scan all same-key rows in [t-10, t]
    rows.foreach { case (id, k, t, _) =>
      val frame = rows.filter(r => r._2 == k && r._3 >= t - 10 && r._3 <= t)
      assert(out(id) == (frame.map(_._4).sum, frame.size.toLong), s"row $id")
    }
  }

  test("transitionCounts conservation: total transitions == rows - groups") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      (s"g${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, i.toLong, s"i${rnd.nextInt(9)}")
    }
    val df = rows.toDF("g", "t", "id", "item")
    val total = Windows
      .transitionCounts(df, "g", Seq(col("t").asc, col("id").asc), "item")
      .agg(sum("transition_count")).as[Long].head()
    val expected = rows.size - rows.map(_._1).distinct.size
    assert(total == expected, s"each row but the last of its group emits exactly one transition")
  }

  test("scd2Intervals: lossless RLE incl. null runs and null-leading keys") {
    val df = Seq[(String, Long, Long, Option[String])](
      ("u1", 10L, 1L, Some("a")),
      ("u1", 20L, 2L, Some("a")), // same run
      ("u1", 30L, 3L, Some("b")), // change
      ("u1", 40L, 4L, None), // null run is a run
      ("u1", 50L, 5L, Some("b")), // b again after null = NEW run
      ("u2", 10L, 6L, None) // null-leading key must still emit
    ).toDF("k", "t", "id", "v")
    val out = Windows.scd2Intervals(df, "k", "t", "id", "v")
      .orderBy("k", "run_seq")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq
    assert(out == Seq(
      ("u1", 1L, Some("a"), 10L, Some(30L)),
      ("u1", 2L, Some("b"), 30L, Some(40L)),
      ("u1", 3L, None, 40L, Some(50L)),
      ("u1", 4L, Some("b"), 50L, None),
      ("u2", 1L, None, 10L, None)))
  }

  test("scd2Intervals plans exactly one exchange (all windows share the key partitioning)") {
    val df = graft.core.Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch_s"))
    val p = Windows.scd2Intervals(df, "user_id", "epoch_s", "event_id", "event_type")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"change-lag, interval-lead and run_seq must share one shuffle:\n$p")
  }

  test("shardedCumsum == naive global running sum, across shard boundaries") {
    import spark.implicits._
    val df = (1L to 97L).map(k => (k, k % 7, k % 3)).toDF("k", "a", "b")
    val out = graft.ops.Windows
      .shardedCumsum(df, "k", Seq("a", "b"), expr("k div 10"))
      .orderBy("k")
      .select("k", "cum_a", "cum_b")
      .as[(Long, Long, Long)].collect()
    var (ca, cb) = (0L, 0L)
    (1L to 97L).zip(out).foreach { case (k, (ko, cao, cbo)) =>
      ca += k % 7; cb += k % 3
      assert(ko == k && cao == ca && cbo == cb, s"at k=$k")
    }
  }

  test("shardedCumsumBy == naive per-partition running sum, across shard boundaries") {
    import spark.implicits._
    val df = (for { g <- Seq("x", "y"); k <- 1L to 53L } yield (g, k, k % 5))
      .toDF("g", "k", "a")
    val out = graft.ops.Windows
      .shardedCumsumBy(df, Seq("g"), "k", Seq("a"), expr("k div 10"))
      .orderBy("g", "k")
      .select("g", "k", "cum_a")
      .as[(String, Long, Long)].collect()
    for (g <- Seq("x", "y")) {
      var c = 0L
      (1L to 53L).zip(out.filter(_._1 == g)).foreach { case (k, (go, ko, co)) =>
        c += k % 5
        assert(go == g && ko == k && co == c, s"at ($g, $k)")
      }
    }
  }

  test("locfFill: nulls take the last prior observation, leading nulls stay") {
    import spark.implicits._
    val df = Seq[(Long, Long, Option[Long])](
      (1L, 1L, None), (1L, 2L, Some(10L)), (1L, 3L, None), (1L, 4L, None),
      (1L, 5L, Some(20L)), (2L, 1L, Some(7L)), (2L, 2L, None))
      .toDF("k", "t", "v")
    val out = Windows.locfFill(df, "k", "t", "v", "f")
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, -1L), (1L, 2L, 10L), (1L, 3L, 10L), (1L, 4L, 10L),
      (1L, 5L, 20L), (2L, 1L, 7L), (2L, 2L, 7L)))
  }
}

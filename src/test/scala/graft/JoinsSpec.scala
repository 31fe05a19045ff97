package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("prefixJoin: strictly-before rows only (point-in-time)") {
    val anchors = Seq(("s1", 100L, "a1"), ("s1", 50L, "a2"), ("s2", 10L, "a3"))
      .toDF("session_id", "at_s", "anchor_id")
    val details = Seq(("s1", 40L, 7L), ("s1", 99L, 8L), ("s1", 100L, 9L), ("s2", 20L, 10L))
      .toDF("session_id", "ts_s", "item")
    val out = Joins
      .prefixJoin(anchors, details, "session_id", "at_s", "ts_s", Seq("item" -> "item"))
      .select("anchor_id", "item").as[(String, Long)].collect().toSet
    // a1 sees 40,99 but NOT 100 (strict <); a2 sees 40; a3 sees nothing
    assert(out == Set(("a1", 7L), ("a1", 8L), ("a2", 7L)))
  }

  test("prefixJoinLeft: anchors without prefix survive with nulls") {
    val anchors = Seq(("s1", 100L, "a1"), ("s9", 10L, "a2"))
      .toDF("session_id", "at_s", "anchor_id")
    val details = Seq(("s1", 40L, 7L)).toDF("session_id", "ts_s", "item")
    val out = Joins
      .prefixJoinLeft(anchors, details, "session_id", "at_s", "ts_s", Seq("item" -> "item"))
      .select("anchor_id", "item").collect()
    assert(out.length == 2)
    val a2 = out.find(_.getString(0) == "a2").get
    assert(a2.isNullAt(1))
  }

  test("covisitationPairs: unordered distinct pairs, threshold, canonical order") {
    val df = Seq(
      ("s1", 1L), ("s1", 2L), ("s1", 2L), ("s1", 3L), // dup item collapses
      ("s2", 1L), ("s2", 2L),
      ("s3", 2L), ("s3", 3L))
      .toDF("session_id", "item_id")
    val pairs = Joins
      .covisitationPairs(df, "session_id", "item_id", minCount = 2L)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) in s1+s2 = 2; (2,3) in s1+s3 = 2; (1,3) only s1 -> filtered
    assert(pairs == Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("covisitationPairs: maxGroupSize drops oversized sessions entirely") {
    val big = (1L to 10L).map(i => ("big", i))
    val small = Seq(("s", 1L), ("s", 2L))
    val df = (big ++ small).toDF("session_id", "item_id")
    val pairs = Joins
      .covisitationPairs(df, "session_id", "item_id", 1L, maxGroupSize = Some(5))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 1L)))
  }

  test("covisitationPairs: frequent-item prefilter is lossless") {
    // item 4 appears in one session only — prunable at minCount=2 —
    // and pairs (1,2),(2,3) must survive identically with/without
    val df = Seq(
      ("s1", 1L), ("s1", 2L), ("s1", 3L), ("s1", 4L),
      ("s2", 1L), ("s2", 2L),
      ("s3", 2L), ("s3", 3L))
      .toDF("session_id", "item_id")
    def run(pf: Boolean) = Joins
      .covisitationPairsDistinct(
        df.distinct(), "session_id", "item_id",
        minCount = 2L, frequentItemPrefilter = pf)
      .as[(Long, Long, Long)].collect().toSet
    val with_ = run(true)
    assert(with_ == run(false))
    assert(with_ == Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("covisitationPairsWeighted: equals naive raw-pair enumeration") {
    // s1 has item 2 three times: pair (1,2) weight 1*3=3 from s1 alone
    val df = Seq(
      ("s1", 1L), ("s1", 2L), ("s1", 2L), ("s1", 2L), ("s1", 3L),
      ("s2", 1L), ("s2", 2L), ("s2", 2L))
      .toDF("session_id", "item_id")
    val weighted = Joins
      .covisitationPairsWeighted(df, "session_id", "item_id", minCount = 1L)
      .as[(Long, Long, Long)].collect().toSet
    val naive = df.as("a")
      .join(df.as("b"),
        col("a.session_id") === col("b.session_id") && col("a.item_id") < col("b.item_id"))
      .groupBy(col("a.item_id").as("item_a"), col("b.item_id").as("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .as[(Long, Long, Long)].collect().toSet
    assert(weighted == naive)
    assert(weighted == Set((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 3L)))
  }

  test("covisitationPairsWeighted: maxGroupSize caps by distinct items") {
    val big = (1L to 6L).flatMap(i => Seq(("big", i), ("big", i))) // 6 distinct, 12 raw
    val small = Seq(("s", 1L), ("s", 2L))
    val df = (big ++ small).toDF("session_id", "item_id")
    val pairs = Joins
      .covisitationPairsWeighted(df, "session_id", "item_id", 1L, maxGroupSize = Some(5))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 1L)))
  }

  test("precedencePairs: directed eventual order, asymmetric counts, threshold") {
    // g1: a(1) b(2) c(3); g2: b(1) a(2); g3: a(1) c(2)
    // a->b: g1 only (g2 reverses); b->a: g2; a->c: g1+g3 = 2; b->c, c->*: 1/0
    val fi = Seq(
      ("g1", "a", 1), ("g1", "b", 2), ("g1", "c", 3),
      ("g2", "b", 1), ("g2", "a", 2),
      ("g3", "a", 1), ("g3", "c", 2))
      .toDF("g", "item", "first_pos")
    val all = graft.core.Caches.withScope {
      Joins.precedencePairs(fi, "g", "item", "first_pos", minCount = 1L)
        .as[(String, String, Long)].collect().toSet
    }
    assert(all == Set(
      ("a", "b", 1L), ("b", "a", 1L), ("a", "c", 2L), ("b", "c", 1L)))
    val thresh = graft.core.Caches.withScope {
      Joins.precedencePairs(fi, "g", "item", "first_pos", minCount = 2L)
        .as[(String, String, Long)].collect().toSet
    }
    assert(thresh == Set(("a", "c", 2L)), "support filter keeps only the repeated direction")
  }

  test("precedencePairs: group cap drops oversized groups entirely") {
    val big = (1 to 5).map(i => ("big", s"i$i", i)) :+ (("ok", "x", 1)) :+ (("ok", "y", 2))
    val fi = big.toDF("g", "item", "first_pos")
    val got = graft.core.Caches.withScope {
      Joins.precedencePairs(fi, "g", "item", "first_pos", minCount = 1L, maxGroupSize = Some(4))
        .as[(String, String, Long)].collect().toSet
    }
    assert(got == Set(("x", "y", 1L)), "the 5-item group must contribute nothing")
  }

  test("asOfJoin: latest at-or-before match, inclusive tie, null when none") {
    val l = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 50L, "q"))
      .toDF("k", "lt", "lid")
    val r = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 25L, "c"), (3L, 1L, "z"))
      .toDF("k", "rt", "v")
    val got = Joins.asOfJoin(l, r, Seq("k"), "lt", "rt")
      .select($"lid", $"rt", $"v").as[(String, Option[Long], Option[String])]
      .collect().toSet
    assert(got == Set(
      ("p1", Some(10L), Some("a")), // tie: rt == lt matches (inclusive)
      ("p2", Some(15L), Some("b")), // latest preceding, not just any
      ("p0", None, None),           // nothing at-or-before
      ("q", None, None)))           // key with no right rows at all
  }

  test("asOfJoin: multi-column keys and multiple value columns move together") {
    val l = Seq((1L, "x", 100L, "a1"), (1L, "y", 100L, "a2")).toDF("k1", "k2", "lt", "lid")
    val r = Seq((1L, "x", 90L, "v90", 9L), (1L, "x", 95L, "v95", 5L))
      .toDF("k1", "k2", "rt", "v", "w")
    val got = Joins.asOfJoin(l, r, Seq("k1", "k2"), "lt", "rt")
      .select($"lid", $"v", $"w").as[(String, Option[String], Option[Long])]
      .collect().toSet
    // both value columns come from the SAME (latest) right row
    assert(got == Set(("a1", Some("v95"), Some(5L)), ("a2", None, None)))
  }

  test("historyJoin: only history strictly before anchor") {
    val anchors = Seq((1L, 100L, "a1")).toDF("user_id", "at_s", "anchor_id")
    val hist = Seq((1L, 99L, "c1"), (1L, 100L, "c2"), (1L, 101L, "c3"))
      .toDF("user_id", "seen_s", "cat")
    val out = Joins.historyJoin(anchors, hist, "user_id", "at_s", "seen_s")
      .select("cat").as[String].collect().toSet
    assert(out == Set("c1"))
  }

  test("leftJoinWithDefaults: nulls replaced per default map") {
    val base = Seq(1L, 2L).toDF("k")
    val feats = Seq((1L, 10L)).toDF("k", "f")
    val out = Joins
      .leftJoinWithDefaults(base, feats, Seq("k"), Map("f" -> lit(-1L)))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, -1L)))
  }

  test("intervalJoin: inclusive containment, per-key only, no cartesian") {
    val probes = Seq((1L, 10L, 5L), (2L, 20L, 15L), (3L, 10L, 99L), (4L, 30L, 5L))
      .toDF("pid", "k", "t")
    val intervals = Seq((10L, 0L, 5L, "w1"), (10L, 50L, 60L, "w2"), (20L, 10L, 15L, "w3"))
      .toDF("k", "s", "e", "w")
    val out = Joins.intervalJoin(probes, intervals, "k", "t", "s", "e")
      .select("pid", "w").as[(Long, String)].collect().toSet
    // pid 1: t=5 inside [0,5] (inclusive end); pid 2: t=15 inside [10,15];
    // pid 3: t=99 in no window; pid 4: key 30 has no intervals
    assert(out == Set((1L, "w1"), (2L, "w3")))
    val plan = Joins.intervalJoin(probes, intervals, "k", "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"interval join must stay keyed:\n$plan")
  }
}

package graft

import graft.ops.FeatureEng
import org.apache.spark.sql.functions._

class FeatureEngSpec extends SparkSpec {
  import spark.implicits._

  test("session_window boundary: gap == 1800 s merges, > 1800 s splits") {
    // Pins the semantics the q96 oracle mirrors (split strictly when
    // gap > gap-duration; window end = last event + gap).
    val df = Seq(
      (1L, 0L), (1L, 1800000000L), // exactly 30 min apart -> one session
      (2L, 0L), (2L, 1800000001L)) // 1 µs over -> two sessions
      .toDF("uid", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = df
      .groupBy(col("uid"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("uid"), unix_micros(col("w.end")).as("e"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(out === Seq(
      (1L, 3600000000L, 2L),
      (2L, 1800000000L, 1L), (2L, 3600000001L, 1L)))
  }

  test("targetEncoding: smoothing pulls small groups to the prior") {
    // global: 10 rows, 5 positive -> prior 0.5; alpha 2
    val df = (Seq.fill(4)(("big", 1)) ++ Seq.fill(4)(("big", 0)) ++
      Seq(("tiny", 1), ("tiny", 0))).toDF("k", "y")
    val te = FeatureEng.targetEncoding(df, "k", "y", alpha = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // big: (4 + 2*0.5) / (8 + 2) = 0.5 ; tiny: (1 + 1) / 4 = 0.5
    assert(te("big") == ((8L, 500000L)))
    assert(te("tiny") == ((2L, 500000L)))
  }

  test("targetEncoding is invariant to partitioning") {
    val df = (1 to 200)
      .map(i => (s"k${i % 7}", i % 3 min 1)).toDF("k", "y")
    val a = FeatureEng.targetEncoding(df, "k", "y", 20)
      .orderBy("k").collect().toSeq
    val b = FeatureEng.targetEncoding(df.repartition(13), "k", "y", 20)
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("winsorizedStats clamps to exact order statistics") {
    // 20 rows 1..20 in one group: k_lo = ceil(.05*20)=1 -> p05 = 1.0,
    // k_hi = ceil(.95*20)=19 -> p95 = 19.0; clipped mean =
    // (sum(1..19) + 19)/20 = 209/20 = 10.45
    val df = (1 to 20).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val r = FeatureEng
      .winsorizedStats(df, "g", "v", Seq("id"), 50000L, 950000L)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 20L)
    assert(r.getAs[Double]("p_lo") == 1.0)
    assert(r.getAs[Double]("p_hi") == 19.0)
    assert(r.getAs[Long]("avg_clip_micro") == 10450000L)
  }

  test("featureHash: buckets in range, counts conserved, sign is ±1") {
    val df = Seq("a b c d e f", "a a b g h").toDF("text")
    val out = FeatureEng.featureHash(df, "text", nBuckets = 8).collect()
    assert(out.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 8))
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 11L)
    // |signed_sum| of a bucket can never exceed its token count
    assert(out.forall(r =>
      math.abs(r.getAs[Long]("signed_sum")) <= r.getAs[Long]("n_tokens")))
  }

  test("pearsonMicro: exact ±1 on linear data, sign of anticorrelation") {
    val df = (1 to 50).map { i =>
      ("g", i.toDouble, 2.0 * i + 1.0, 100.0 - i)
    }.toDF("g", "x", "y_pos", "y_neg")
    val r = FeatureEng
      .pearsonMicro(df, "g",
        Seq(("x", "y_pos", "c_pos"), ("x", "y_neg", "c_neg")))
      .collect().head
    assert(r.getAs[Long]("c_pos_micro") == 1000000L)
    assert(r.getAs[Long]("c_neg_micro") == -1000000L)
  }

  test("pearsonMicro: constant column yields null, not NaN") {
    val df = (1 to 10).map(i => ("g", i.toDouble, 5.0)).toDF("g", "x", "y")
    val r = FeatureEng.pearsonMicro(df, "g", Seq(("x", "y", "c"))).collect().head
    assert(r.isNullAt(r.fieldIndex("c_micro")))
  }
}

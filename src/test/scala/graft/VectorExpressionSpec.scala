package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("longVectorDot: codegen and interpreted paths agree with HOF formulation") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-10L, 0L), Seq(7L, 9L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.longVectorDot(col("a"), col("b")).as("dot"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, v) => s + v)
        .as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (dot, hof) => assert(dot == hof) }
    assert(out.head._1 == 32L)
  }

  test("long_vector_dot is SQL-callable after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val n = spark.sql("SELECT long_vector_dot(array(1L,2L), array(3L,4L)) AS d")
      .as[Long].head()
    assert(n == 11L)
  }

  test("word_shingles and minhash_signature are SQL-callable after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val sh = spark.sql("SELECT word_shingles('a b c d', 2) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
    val sig = spark.sql("SELECT minhash_signature(word_shingles('a b c d', 2), 4) AS g")
      .as[Seq[String]].head()
    assert(sig.length == 4 && sig.forall(_.length == 32))
  }

  test("MinHashSignature expression equals the HOF formulation exactly") {
    val docs = Seq(
      Seq("alpha beta", "beta gamma", "gamma delta"),
      Seq("one two"),
      Seq.empty[String])
      .toDF("sh")
    val out = docs.select(
      org.apache.spark.sql.graft.MinHashSignature(col("sh"), 6).as("fast"),
      array((0 until 6).map(i =>
        array_min(transform(col("sh"), s => md5(concat(lit(s"s$i|"), s))))): _*).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (fast, hof) => assert(fast == hof) }
  }

  test("Md5Prefix60: bit-identical to the conv(substring(md5)) convention, string and binary") {
    val df = Seq("", "a", "hello world", "42", "The quick brown fox")
      .toDF("s")
      .withColumn("b", col("s").cast("binary"))
    val rows = df.select(
      VectorExpressions.md5Prefix60(col("s")).as("k_s"),
      VectorExpressions.md5Prefix60(col("b")).as("k_b"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("chain_s"),
      conv(substring(md5(col("b")), 1, 15), 16, 10).cast("long").as("chain_b"))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (ks, kb, cs, cb) =>
      assert(ks == cs, "string kernel drifted from the conv chain")
      assert(kb == cb, "binary kernel drifted from the conv chain")
      assert(ks == kb, "utf-8 string and its bytes must hash identically")
    }
    // null pass-through
    val n = Seq(Option.empty[String]).toDF("s")
      .select(VectorExpressions.md5Prefix60(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("DriverLit: behaves as the wrapped literal, prints shape-only") {
    val dl = VectorExpressions.driverLit(12345L)
    val out = spark.range(3).select((col("id") + dl).as("v")).as[Long].collect()
    assert(out.toSeq == Seq(12345L, 12346L, 12347L))
    // plan text carries driver_lit, never the VALUE (the cross-SF
    // fingerprint contract this expression exists for)
    val plan = spark.range(1).select(dl.as("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("driver_lit"), plan)
    assert(!plan.contains("12345"), s"driver value leaked into plan text:\n$plan")
  }

  test("longVectorDot: null inputs yield null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(VectorExpressions.longVectorDot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("FloatVectorQuantize: bit-identical to the round() HOF it replaced") {
    // adversarial grid: exact .5 boundaries, negatives, denormal-ish,
    // and a dense pseudo-random sweep — HALF_UP parity must be exact
    val handPicked = Seq(
      0.00005f, -0.00005f, 0.00015f, -0.00015f, 0.5f, -0.5f,
      0.12345f, -0.12345f, 1.0f, -1.0f, 0.99995f, -0.99995f, 0f)
    val sweep = (0 until 20000).map(i => ((i * 2654435761L % 200001) - 100000) / 100000.0f)
    val df = Seq((1L, handPicked ++ sweep)).toDF("id", "emb")
    val r = df.select(
      VectorExpressions.floatVectorQuantize(col("emb")).as("fast"),
      transform(col("emb"), x => round(x.cast("double") * 10000).cast("long")).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect().head
    assert(r._1 == r._2)
  }

  test("FloatVectorQuantize: double arrays and null pass-through") {
    val df = Seq((Some(Seq(0.12345d, -0.5d)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(
      VectorExpressions.floatVectorQuantize(col("a")),
      VectorExpressions.floatVectorQuantize(col("b"))).collect().head
    assert(r.getAs[scala.collection.Seq[Long]](0) == Seq(1235L, -5000L))
    assert(r.isNullAt(1))
  }

  test("pq_encode / centroid_top_k fail LOUD on vector-length mismatch") {
    // a short vector would otherwise read unchecked garbage via
    // UnsafeArrayData.getLong — same loud-guard seam as the
    // FloatVectorQuantize null-slot check
    val cb = IndexedSeq(1L, 2L, 3L, 4L) // m=2, dsub=1, ksub=2
    val pres = IndexedSeq(true, true, true, true)
    val bad = Seq(Tuple1(Seq(7L, 8L, 9L))).toDF("v") // length 3, m*dsub = 2
    val e1 = intercept[Exception] {
      bad.select(VectorExpressions.pqEncode(col("v"), cb, pres, 2, 1, 2)).collect()
    }
    assert(e1.getMessage.contains("pq_encode") ||
      (e1.getCause != null && e1.getCause.getMessage.contains("pq_encode")))
    val e2 = intercept[Exception] {
      bad.select(VectorExpressions.centroidTopK(
        col("v"), IndexedSeq(1L, 2L), IndexedSeq(0L), dim = 2, top = 1)).collect()
    }
    assert(e2.getMessage.contains("centroid_top_k") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("centroid_top_k")))
    // well-formed input still encodes (guards are length checks, not new semantics)
    val ok = Seq(Tuple1(Seq(7L, 8L))).toDF("v")
      .select(VectorExpressions.pqEncode(col("v"), cb, pres, 2, 1, 2).as("c"))
      .as[Seq[Long]].head()
    assert(ok.length == 2)
  }

  test("norm2 + knn stays inside whole-stage codegen") {
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val scored = emb.select(
      col("vec_id"),
      VectorExpressions.longVectorNorm2(
        graft.similarity.Similarity.quantize(col("embedding"))).as("n2"))
    val codegen = scored.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen subtree"))
    assert(codegen.contains("long_vector_dot") || scored.count() > 0)
  }
}

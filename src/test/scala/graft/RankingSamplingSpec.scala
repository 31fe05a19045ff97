package graft

import graft.functions.TextRanking
import graft.ops.{Aggregates, Sampling}
import org.apache.spark.sql.functions._

/** Round-2 extension operators: TF-IDF / BM25 ranking, deterministic
  * hash sampling, positional quantiles.
  */
class RankingSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark shuffles data across the cluster"),
    (1L, "spark caches data in memory"),
    (2L, "the optimizer prunes columns and pushes filters"),
    (3L, "spark spark spark tuning guide")).toDF("doc_id", "text")

  test("tfidfTopTerms ranks rare terms above common ones, ties by term") {
    val top = TextRanking.tfidfTopTerms(docs, "text", "doc_id", k = 3)
    val d0 = top.filter($"doc_id" === 0L).orderBy($"rn").collect()
    // 'spark' appears in 3 of 4 docs -> lowest idf; doc-0-unique terms first
    assert(d0.map(_.getAs[String]("term")).take(2).forall(t => t != "spark"))
    // deterministic: same result under repartition
    val again = TextRanking
      .tfidfTopTerms(docs.repartition(7), "text", "doc_id", k = 3)
      .orderBy($"doc_id", $"rn")
    assert(again.collect().toSeq == top.orderBy($"doc_id", $"rn").collect().toSeq)
  }

  test("bm25Scores: matching docs score positive, non-matching zero, exact long math") {
    val scored = TextRanking
      .bm25Scores(docs, "text", "doc_id", Seq("spark", "optimizer"))
      .orderBy($"doc_id")
      .collect()
    assert(scored.length == 4)
    val byId = scored.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getAs[Long]("n_matched") == 1L) // optimizer only
    assert(scored.forall(_.getAs[Long]("score_micro") >= 0L))
    // tf saturation: doc 3 has tf=3 'spark' but scores LESS than 3x doc 1's tf=1
    assert(byId(3L).getAs[Long]("score_micro") < 3 * byId(1L).getAs[Long]("score_micro"))
  }

  test("dsirLogWeights: target-vocabulary docs out-weigh raw-typical docs; zero-information split is flat") {
    // target docs (0,1) speak 'alpha/beta'; raw-only docs (2,3) speak
    // 'gamma/delta'. A doc made of target terms must carry a strictly
    // higher importance weight than one made of raw-only terms.
    val d = Seq(
      (0L, true, "alpha beta alpha"),
      (1L, true, "beta alpha beta"),
      (2L, false, "gamma delta gamma"),
      (3L, false, "delta gamma delta")).toDF("doc_id", "is_t", "text")
    val w = TextRanking.dsirLogWeights(d, "text", "doc_id", col("is_t"))
      .select("doc_id", "logweight_micro").as[(Long, Long)].collect().toMap
    assert(w(0L) > w(2L) && w(1L) > w(3L))
    assert(w(0L) > 0L && w(2L) < 0L, "target-only terms weigh positive, raw-only negative")
    // when every doc is target, p_t == p_r and every weight is exactly 0
    val flat = TextRanking.dsirLogWeights(d, "text", "doc_id", lit(true))
      .select("logweight_micro").as[Long].collect()
    assert(flat.forall(_ == 0L))
  }

  test("dsirLogWeights: repartition-stable") {
    val d = Seq(
      (0L, "alpha beta gamma"), (1L, "beta beta delta"),
      (2L, "gamma delta alpha"), (3L, "alpha alpha beta")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextRanking.dsirLogWeights(df, "text", "doc_id", col("doc_id") % 2 === 0)
        .orderBy("doc_id").collect().toSeq
    assert(run(d.repartition(5)) == run(d.coalesce(1)))
  }

  test("stratifiedHashSample keeps rate-1000 strata fully and is repartition-stable") {
    val df = spark.range(0, 2000).select(
      col("id").as("event_id"),
      when(col("id") % 2 === 0, "keep_all").otherwise("downsample").as("stratum"))
    val sampled = Sampling.stratifiedHashSample(
      df, "event_id", "stratum", Map("keep_all" -> 1000), defaultPermille = 100)
    assert(sampled.filter($"stratum" === "keep_all").count() == 1000L)
    val down = sampled.filter($"stratum" === "downsample").count()
    assert(down > 50 && down < 200) // ~10% of 1000
    val again = Sampling.stratifiedHashSample(
      df.repartition(13), "event_id", "stratum", Map("keep_all" -> 1000), defaultPermille = 100)
    assert(again.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      sampled.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("contamination flags only docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta"),
      (2L, "unrelated words entirely here")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta suffix"),
      (101L, "nothing in common at all")).toDF("doc_id", "text")
    val r = graft.dedup.Dedup
      .contamination(corpus, bench, "text", "doc_id", n = 4)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("id") == 0L)
    assert(r.head.getAs[Long]("n_bench_docs") == 1L)
  }

  test("decontaminateBloom == exact anti-join (bloom prefilter is lossless)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val train = docs.filter(pmod($"doc_id", lit(7L)) =!= 3L)
    val bench = docs.filter(pmod($"doc_id", lit(7L)) === 3L)
    val viaBloom = graft.dedup.Dedup
      .decontaminateBloom(train, bench, "text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val contaminated = graft.dedup.Dedup
      .contamination(train, bench, "text", "doc_id", n = 8)
      .select($"id".as("doc_id"))
    val exact = train.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBloom == exact)
    assert(viaBloom.nonEmpty && viaBloom.size < train.count()) // both classes occur
  }

  test("bloom mightContain: no false negatives over inserted hashes") {
    import org.apache.spark.sql.graft.BloomFunctions._
    val vals = (0L until 2000L).toDF("v")
    val bf = vals.agg(bloomFilterAgg(xxhash64($"v"), 2000L, 1L << 16).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    assert(vals.filter(mightContain(bf, xxhash64($"v"))).count() == 2000L)
  }

  test("decontaminateBloom: empty benchmark returns the corpus unchanged") {
    val corpus = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    assert(graft.dedup.Dedup
      .decontaminateBloom(corpus, bench, "text", "doc_id", n = 2)
      .count() == 1L)
  }

  test("simhash banded pairs == brute force for hamming <= bands-1") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val banded = graft.dedup.Dedup
      .simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3, bands = 4)
      .select("id_a", "id_b", "hamming")
    val sims = graft.dedup.Dedup.simhash32(docs, "text", "doc_id")
    val brute = sims.select(col("id").as("id_a"), col("simhash").as("sim_a"))
      .crossJoin(sims.select(col("id").as("id_b"), col("simhash").as("sim_b")))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        bit_count($"sim_a".bitwiseXOR($"sim_b")).cast("long").as("hamming"))
      .filter($"hamming" <= 3)
    assert(banded.orderBy("id_a", "id_b").collect().toSeq ==
      brute.orderBy("id_a", "id_b").collect().toSeq)
  }

  test("chunkDocs: lossless cover, exact sizes, short tail") {
    val docs = Seq((0L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val c = graft.functions.Chunking.chunkDocs(docs, "text", "doc_id", chunkTokens = 4)
      .orderBy($"chunk_idx").collect()
    assert(c.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 2L))
    assert(c.map(_.getAs[String]("chunk_text")).mkString(" ") ==
      (1 to 10).map(i => s"w$i").mkString(" "))
  }

  test("packGreedy: bins bounded, contiguous in id order, repartition-stable") {
    val df = spark.range(0, 100).select(
      col("id").as("doc_id"), (col("id") % 4).as("shard"), lit(10L).as("n_tokens"))
    val packed = graft.functions.Chunking
      .packGreedy(df, "shard", "doc_id", col("n_tokens"), capacity = 35L)
    // each shard: 25 docs x 10 tokens, capacity 35 -> bins of 4 rows (cum 0,10,20,30 -> bin 0; 40 -> bin 1)
    val perBin = packed.groupBy("shard", "bin_idx").count().collect()
    assert(perBin.forall(r => r.getAs[Long]("count") <= 4))
    val again = graft.functions.Chunking
      .packGreedy(df.repartition(11), "shard", "doc_id", col("n_tokens"), capacity = 35L)
    assert(again.orderBy("doc_id").collect().toSeq == packed.orderBy("doc_id").collect().toSeq)
  }

  test("positionalQuantiles picks exact order statistics") {
    val df = (1 to 10).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "tie")
    val q = Aggregates
      .positionalQuantiles(df, Seq("g"), col("v"), Seq(col("tie")),
        Seq("p0" -> 0.0, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
      .collect().head
    // n=10: p0 -> pos 1 (v=1), p50 -> floor(4.5)+1=5 (v=5), p90 -> floor(8.1)+1=9, p100 -> 10
    assert(q.getAs[Long]("n_rows") == 10L)
    assert(q.getAs[Double]("p0") == 1.0)
    assert(q.getAs[Double]("p50") == 5.0)
    assert(q.getAs[Double]("p90") == 9.0)
    assert(q.getAs[Double]("p100") == 10.0)
  }

  test("deterministicGroupSample: exact k per group, nested and partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "id")
    def run(input: org.apache.spark.sql.DataFrame, k: Int) = graft.ops.Sampling
      .deterministicGroupSample(input, "g", "id", k)
      .select("g", "id").as[(String, Long)].collect().toSet
    val k10 = run(df, 10)
    assert(k10.count(_._1 == "a") == 10 && k10.count(_._1 == "b") == 10)
    assert(run(df.repartition(13), 10) == k10)
    // nested-sample property: the 5-sample is a subset of the 10-sample
    assert(run(df, 5).subsetOf(k10))
  }

  test("weightedSampleTopK: priorities are -ln(u) div w, heavier rows sample first at equal hash") {
    val df = (1L to 50L).map(i => (i, 1L + (i % 5))).toDF("id", "w")
    val out = Sampling.weightedSampleTopK(df, "id", "w", k = 10).collect()
    assert(out.length == 10)
    // recompute one row's priority by hand from the same md5 derivation
    val first = out.head
    val id = first.getAs[Long]("id")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${id}_ws".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(md.take(15), 16)
    val nano = math.round(-math.log((h.toDouble + 1) / 1152921504606846976.0) * 1e9)
    assert(first.getAs[Long]("priority") == nano / first.getAs[Long]("weight"))
    // deterministic under repartitioning, and nested: k=5 is a prefix of k=10
    val again = Sampling.weightedSampleTopK(df.repartition(7), "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(again == out.map(_.getAs[Long]("id")).toSeq)
    val k5 = Sampling.weightedSampleTopK(df, "id", "w", k = 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(k5 == out.map(_.getAs[Long]("id")).take(5).toSeq)
  }
}

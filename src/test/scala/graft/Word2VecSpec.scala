package graft

import graft.pipeline.{Embeddings, Pipeline}
import org.apache.spark.sql.functions._

/** X2 invariants (SURVEY.md §5): Word2Vec is ⊘ non-oracle-checkable,
  * so we pin vocabulary membership, dimensionality, and fixed-seed
  * single-partition determinism instead of vectors.
  */
class Word2VecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val seqs =
    Embeddings.sessionSequences(
      Pipeline.enrichedEvents(spark, sf("sf0.001")), "category_id").cache()

  test("vocabulary = tokens with >= minCount occurrences") {
    val vocab = Embeddings.trainWord2Vec(seqs, minCount = 3)
      .select("word").as[String].collect().toSet
    val counts = seqs.select(explode(col("seq")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val expected = counts.filter(_._2 >= 3).keySet
    assert(vocab == expected)
  }

  test("vector dimensionality matches vectorSize") {
    val dims = Embeddings.trainWord2Vec(seqs, vectorSize = 16)
      .select(org.apache.spark.ml.functions.vector_to_array(col("vector")).as("arr"))
      .select(size(col("arr"))).as[Int].collect().toSet
    assert(dims == Set(16))
  }

  test("fixed seed + single partition is deterministic") {
    val one = seqs.coalesce(1).cache()
    def train() = Embeddings.trainWord2Vec(one, seed = 42L)
      .select(col("word"),
        org.apache.spark.ml.functions.vector_to_array(col("vector")).as("v"))
      .as[(String, Seq[Double])].collect().toMap
    val (a, b) = (train(), train())
    assert(a.keySet == b.keySet)
    a.keySet.foreach(k => assert(a(k) == b(k), s"vectors differ for $k"))
  }
}

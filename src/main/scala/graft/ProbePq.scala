package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall sweep for the PQ-ADC configuration (q155 contract sizing):
  * `tools/probe.sh graft.ProbePq [sfDir]`.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 64)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    def recallOf(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }
    for {
      (m, ksub) <- Seq((8, 16), (8, 32), (16, 16), (16, 32), (32, 16), (32, 32))
      rerank <- Seq(32, 64)
      opq <- Seq(false, true)
    } {
      val r = graft.core.Caches.withScope {
        recallOf(topSets(Similarity.pqTopK(
          queries, emb, "vec_id", "embedding", k = 5, m = m, ksub = ksub,
          rerank = rerank, opqPermute = opq)))
      }
      println(f"[probe-pq] m=$m%2d ksub=$ksub%2d rerank=$rerank%2d opq=$opq%-5s recall@5=$r%.3f")
    }
    for {
      nProbe <- Seq(6, 8)
      nAssign <- Seq(2, 3)
      rerank <- Seq(32, 64)
      opq <- Seq(false, true)
    } {
      val r = graft.core.Caches.withScope {
        recallOf(topSets(Similarity.ivfPqTopK(
          queries, emb, "vec_id", "embedding", k = 5,
          nCentroids = 16, nProbe = nProbe, m = 16, ksub = 32,
          rerank = rerank, nAssign = nAssign, opqPermute = opq)))
      }
      println(f"[probe-ivfpq] cells=16 probe=$nProbe%d assign=$nAssign%d rerank=$rerank%2d opq=$opq%-5s recall@5=$r%.3f")
    }
    spark.stop()
  }
}

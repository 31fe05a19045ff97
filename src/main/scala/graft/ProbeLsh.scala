package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall sweep for multi-probe LSH (q36 sizing): tables × probeBits
  * grid vs brute-force truth. `tools/probe.sh graft.ProbeLsh [sfDir]`.
  */
object ProbeLsh {
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
    // q36's production shape is planes=3 × tables=8 (recall 0.884);
    // the question multi-probe answers: does probing Hamming-1 buckets
    // beat adding tables at the same candidate budget?
    for {
      (planes, tables) <- Seq((3, 4), (3, 6), (3, 8), (4, 8))
      probeBits <- 0 to planes
    } {
      val t0 = System.nanoTime()
      val r = graft.core.Caches.withScope {
        recallOf(topSets(Similarity.lshBucketedTopK(
          queries, emb, "vec_id", "embedding", k = 5,
          planes = planes, dim = 64, tables = tables, probeBits = probeBits)))
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe-lsh] planes=$planes tables=$tables probeBits=$probeBits%d recall@5=$r%.3f wall=$s%5.1f s")
    }
    spark.stop()
  }
}

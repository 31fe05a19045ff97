package graft
import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugQ42 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $n%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val docs = Tables.documents(spark, d)
    val sh = t("shingles") { val s = Dedup.shingles(docs, "text", "doc_id", 4).cache(); s.count(); s }
    val sigs = t("signatures") {
      val s = Dedup.minhashSignaturesInline(docs, "text", "doc_id", 4, 16).cache(); s.count(); s }
    val bands = t("bands") { val b = Dedup.lshBands(sigs, 4, 4).cache(); b.count(); b }
    val cand = t("candidates") { val c = Dedup.lshCandidatePairs(bands).cache(); println("pairs=" + c.count()); c }
    val ver = t("jaccard verify") {
      val v = Dedup.jaccardOnPairs(cand, sh).filter(col("jaccard_ppm") >= 500000L)
        .select("id_a", "id_b").cache(); println("verified=" + v.count()); v }
    t("components") { println("cc=" + Dedup.connectedComponents(ver).count()) }
    spark.stop()
  }
}

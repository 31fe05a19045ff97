package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeW2vLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val enriched = graft.pipeline.Pipeline.enrichedEvents(spark, sfDir)
    val seqs = graft.pipeline.Embeddings.sessionSequences(enriched, "category_id").cache()
    seqs.count()
    def train(df: org.apache.spark.sql.DataFrame, label: String): Map[String, Seq[Double]] = {
      val m = graft.pipeline.Embeddings.trainWord2Vec(df)
        .select(col("word"), org.apache.spark.ml.functions.vector_to_array(col("vector")).as("v"))
        .as[(String, Seq[Double])].collect().toMap
      println(s"[w2v] $label vocab=${m.size}")
      m
    }
    val base = train(seqs.coalesce(1), "coalesce1-a")
    val again = train(seqs.coalesce(1), "coalesce1-b")
    val rep5 = train(seqs.repartition(5), "repartition5")
    val rep32 = train(seqs.repartition(32), "repartition32")
    def diff(a: Map[String, Seq[Double]], b: Map[String, Seq[Double]], l: String): Unit = {
      val shared = a.keySet intersect b.keySet
      val maxd = shared.map(k => a(k).zip(b(k)).map { case (x, y) => math.abs(x - y) }.max).max
      println(f"[w2v] $l: vocabEq=${a.keySet == b.keySet} maxAbsDiff=$maxd%.6g")
    }
    diff(base, again, "coalesce1 rerun")
    diff(base, rep5, "coalesce1 vs rep5")
    diff(base, rep32, "coalesce1 vs rep32")
    spark.stop()
  }
}

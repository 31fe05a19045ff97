package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePhashBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val media = graft.multimodal.Multimodal.asMediaTable(docs, "doc_id", "text")
    val t0=System.nanoTime()
    val ph = graft.multimodal.Multimodal.perceptualHash64(media).cache()
    println("[b] n hash: " + ph.count() + " in " + (System.nanoTime()-t0)/1e9 + " s")
    val bands = 4; val bpb = 16
    val banded = ph.select(col("id"), col("phash"),
      explode(array((0 until bands).map{b=>struct(lit(b).as("bi"),
        shiftright(col("phash"), b*bpb).bitwiseAND(lit((1L<<bpb)-1)).as("bv"))}:_*)).as("band"))
      .select(col("id"), col("band.bi"), col("band.bv"))
    val occ = banded.groupBy("bi","bv").count()
    occ.select(sum(col("count")*col("count")).as("cand_volume"), max("count").as("max_bucket"), count(lit(1)).as("n_buckets")).show()
    spark.stop()
  }
}

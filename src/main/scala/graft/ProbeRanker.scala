package graft

import graft.ops.Eval
import graft.pipeline.Ranker
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: cross-check Eval.aucPpm against MLlib's own evaluator and
  * inspect the GBT head's score distribution on the golden artifacts —
  * the measurement behind RankerSpec's floors. Run via tools/probe.sh.
  */
object ProbeRanker {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val trainPath = "/root/reference/data/processed/X_train_spark.parquet"
    val validPath = "/root/reference/data/processed/X_valid_spark.parquet"

    val trainSample = Ranker.assemble(
      spark.read.parquet(trainPath)
        .filter(expr("conv(substring(md5(session_id), 1, 4), 16, 10) % 5 = 0")))
      .localCheckpoint(true)
    println(s"[probe] train sample rows=${trainSample.count()} " +
      s"pos=${trainSample.agg(sum(col("y"))).head().get(0)}")

    val validAsm = Ranker.assemble(spark.read.parquet(validPath))
      .localCheckpoint(true)

    // exact per-feature signal screen on both artifacts (pin source)
    for ((p, tag) <- Seq((trainPath, "train"), (validPath, "valid"))) {
      val rows = Eval.labelSignalAucPpm(
        spark.read.parquet(p), Ranker.baseFeatures, "y").collect()
      rows.foreach(r => println(
        s"[signal] $tag ${r.getAs[String]("feature")} auc=${r.getAs[Long]("auc_ppm")}"))
    }

    val raw = spark.read.parquet(trainPath)
      .filter(expr("conv(substring(md5(session_id), 1, 4), 16, 10) % 5 = 0"))
    val rawValid = spark.read.parquet(validPath)
    for (feats <- Seq(
        Ranker.screenedFeatures,
        Ranker.baseFeatures ++ Ranker.embFeatures)) {
      val tr = Ranker.assemble(raw, feats).localCheckpoint(true)
      val va = Ranker.assemble(rawValid, feats).localCheckpoint(true)
      val model = Ranker.train(tr, maxIter = 8, maxDepth = 5)
      val scoredVa = Ranker.score(model, va).localCheckpoint(true)
      def auc(sc: org.apache.spark.sql.DataFrame): Long =
        Eval.aucPpm(sc, col("p1"), "y").head().getAs[Long]("auc_ppm")
      val at20 = Eval.recallAtKPpm(
        scoredVa, Seq("session_id", "atc_ts"), "y",
        col("p1"), Seq("category_id"), k = 20).head().getAs[Long]("recall_ppm")
      println(s"[probe] nfeat=${feats.length} " +
        s"trainAUC=${auc(Ranker.score(model, tr))} validAUC=${auc(scoredVa)} " +
        s"recall20=$at20")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe for the embedding cohort (ANN indexes + the round-9
  * diagnostics q254–q261): replicates sf0.1's embeddings table R× with
  * fresh vec_ids and a small deterministic per-replica perturbation
  * (±0.1 per component, a pure hash of (vec_id, pos)) so replicas do
  * NOT collapse into identical LSH/IVF buckets — duplicated points
  * would manufacture bucket skew no real corpus has. Labels keep their
  * marginal distribution. Catches superlinear pair blowups, broadcast
  * walls, and guard misfires that the 2k-row bench scale cannot.
  *
  * Usage: tools/probe.sh graft.ProbeScaleEmbeddings <R> [srcSf] [outDir] [queryFilter]
  *   e.g. R=500 = 1M vectors (sf0.1 = 2k vectors). Reuses outDir if it
  *   already holds the replica parquet; queryFilter is a substring
  *   restricting the cohort (e.g. "q58").
  */
object ProbeScaleEmbeddings {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(500)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse(s"/tmp/scale_emb_x$r")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queryFilter = args.drop(3).headOption.getOrElse("")
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
      val base = graft.core.Tables.embeddings(spark, src)
      val idSpan = base.agg(max(col("vec_id"))).head().getLong(0) + 1L
      base
        .select(explode(sequence(lit(0L), lit(r - 1L))).as("__r"), col("*"))
        .select(
          (col("vec_id") + col("__r") * idSpan).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              (pmod(xxhash64(col("vec_id"), col("__r"), i), lit(201L)) - 100L)
                .cast("double") * 0.001).cast("float")).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    val n = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"[scale] embeddings x$r = $n rows at $out")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val cohort = Seq(
      "q36_knn_lsh", "q40_embedding_neardup_lsh", "q41_knn_ivf",
      "q58_label_centroids", "q142_semantic_dedup", "q155_knn_pq",
      "q160_knn_ivfpq", "q199_random_projection",
      "q254_silhouette", "q255_stratified_kfold", "q256_power_iteration",
      "q257_conformal_coverage", "q258_matryoshka_fidelity",
      "q260_label_noise", "q261_centroid_drift",
      "q266_int8_quant", "q269_kcenter_coreset", "q274_embedding_anova",
      "q313_kmeans")
    // Bucket-quadratic LSH ops: the contract pins planes for the oracle
    // (6/8 at 500–2k vectors); at scale `planes` is the deployment knob
    // that holds bucket occupancy ~n/2^planes constant. Probe them with
    // scale-matched planes (occupancy ~30) instead of the toy setting.
    val scalePlanes =
      math.max(6, (math.log(n / 30.0) / math.log(2.0)).ceil.toInt)
    val direct: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      (s"q270_mutual_knn[p=$scalePlanes]", () =>
        graft.similarity.Similarity.mutualKnn(
          graft.core.Tables.embeddings(spark, out), "vec_id", "embedding",
          planes = scalePlanes)),
      (s"q271_hard_negs[p=$scalePlanes]", () =>
        graft.similarity.Similarity.hardNegatives(
          graft.core.Tables.embeddings(spark, out), "vec_id", "label",
          "embedding", planes = scalePlanes, queryMod = 1000L)),
      (s"q277_knn_outliers[p=$scalePlanes]", () =>
        graft.similarity.Similarity.knnOutliers(
          graft.core.Tables.embeddings(spark, out), "vec_id", "embedding",
          planes = scalePlanes)))
    val runnable =
      cohort.map(q => (q, () => SparkEntry.queries(q)(spark, out))) ++ direct
    runnable
      .filter(_._1.contains(queryFilter))
      .foreach { case (name, mk) =>
        graft.core.Caches.withScope {
          org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
          val b0 = shuffleBytes.get
          val t0 = System.nanoTime()
          val res = try Right(mk().count())
          catch { case e: Throwable => Left(e.toString.take(120)) }
          val t = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
          val mb = (shuffleBytes.get - b0) / 1e6
          res match {
            case Right(rows) =>
              println(f"[scale] $name%-28s $t%8.1f s ${mb}%8.1f MB $rows%10d rows")
            case Left(err) => println(f"[scale] $name%-28s $t%8.1f s FAILED: $err")
          }
        }
      }
    spark.stop()
  }
}

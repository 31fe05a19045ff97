package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 experiment: which LPA update schedule escapes the two
  * degenerate regimes q287's modularity audit exposed (sync-LPA
  * 2-coloring on the sparse sf0.01 covis forest -> Q<0; one-giant-label
  * collapse on the dense sf0.1 cores -> Q=0)?
  *
  * Variants, all deterministic / oracle-expressible:
  *   sync       current Graph.labelPropagation (most-frequent, tie->min)
  *   self       + the vertex's own current label counts as one vote
  *   retain     self-vote, tie prefers OWN label, then min
  *   parity     md5-parity half-steps (semi-asynchronous schedule)
  *   parityself parity half-steps + self-vote (tie->min)
  *   parityret  parity half-steps + self-vote + retention tie-break
  *
  * `runMain graft.ProbeLpa [sfDir ...]` prints Q (ppm), community
  * count, and max community size per variant.
  */
object ProbeLpa {
  private def parityOf(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 2

  /** One vote step over `und` restricted to sources in `srcFilter`,
    * returning (id, label) winners for those sources only. */
  private def vote(
      und: DataFrame,
      labels: DataFrame,
      selfVote: Boolean,
      retain: Boolean,
      par: Option[Int]): DataFrame = {
    val srcs = par match {
      case Some(p) => und.filter(parityOf(col("src")) === p)
      case None    => und
    }
    val neigh = srcs
      .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
      .select(col("src").as("id"), col("label"))
    val base = if (selfVote) {
      val own = par match {
        case Some(p) => labels.filter(parityOf(col("id")) === p)
        case None    => labels
      }
      neigh.unionByName(own.select(col("id"), col("label")))
    } else neigh
    val counted = base.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
    val ranked = if (retain) {
      val withOwn = counted.join(
        labels.select(col("id"), col("label").as("own")), Seq("id"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("id"))
        .orderBy(col("cnt").desc, (col("label") === col("own")).desc, col("label").asc)
      withOwn.withColumn("rn", row_number().over(w))
    } else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("id")).orderBy(col("cnt").desc, col("label").asc)
      counted.withColumn("rn", row_number().over(w))
    }
    ranked.filter(col("rn") === 1).select(col("id"), col("label"))
  }

  def lpa(
      edges: DataFrame,
      rounds: Int,
      selfVote: Boolean,
      retain: Boolean,
      parity: Boolean): DataFrame = {
    val e0 = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
    val und = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      if (parity) {
        for (p <- 0 to 1) {
          val w = vote(und, labels, selfVote, retain, Some(p))
          labels = labels.join(w.withColumnRenamed("label", "nl"), Seq("id"), "left")
            .select(col("id"), coalesce(col("nl"), col("label")).as("label"))
            .localCheckpoint(true)
        }
      } else {
        labels = vote(und, labels, selfVote, retain, None).localCheckpoint(true)
      }
    }
    labels
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (d <- dirs) {
      val enriched = graft.pipeline.Pipeline.enrichedEvents(spark, d)
      val pairs = graft.ops.Joins.covisitationPairs(
        enriched.select(col("session_id"), col("item_id")),
        "session_id", "item_id", minCount = 2L)
        .localCheckpoint(true)
      val nE = pairs.count()
      println(s"[probe-lpa] $d: $nE covis edges")
      val variants = Seq(
        ("sync", false, false, false),
        ("self", true, false, false),
        ("retain", true, true, false),
        ("parity", false, false, true),
        ("parityself", true, false, true),
        ("parityret", true, true, true))
      for ((name, sv, rt, par) <- variants) {
        val t0 = System.nanoTime()
        val labels = lpa(pairs, 4, sv, rt, par)
        val mod = graft.ops.Graph.modularityPpm(pairs, "item_a", "item_b", labels)
          .agg(
            sum(col("contrib_ppm")).as("q_ppm"),
            count(lit(1)).as("n_comm"),
            max(col("n_nodes")).as("max_comm"))
          .head()
        println(f"[probe-lpa] $d $name%-10s Q=${mod.getLong(0)}%8d ppm  " +
          f"communities=${mod.getLong(1)}%6d  max_size=${mod.getLong(2)}%6d  " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}

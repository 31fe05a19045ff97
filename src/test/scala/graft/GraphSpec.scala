package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** PageRank invariants: rank floor, source-node base rank, sink
  * accumulation, and bit-determinism across partitionings.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    // a tiny chain+fan graph: 1 -> 2 (x3), 1 -> 3, 2 -> 3, 4 isolated-source
    (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 4L), (4L, 2L, 2L)
  ).toDF("src", "dst", "w")

  test("ranks respect the base floor; pure sources sit exactly at base") {
    val pr = Graph.pagerankMicro(edges, "src", "dst", "w", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.values.forall(_ >= 150000L), "rank below the (1-d) base")
    assert(pr(1L) == 150000L && pr(4L) == 150000L, "no-in-edge nodes must hold the base rank")
    assert(pr(3L) > pr(2L), "the sink fed by everything must out-rank its feeders")
  }

  test("bit-identical under repartitioning and re-run") {
    val a = Graph.pagerankMicro(edges.repartition(7), "src", "dst", "w", iters = 3)
      .orderBy("id").collect().toSeq
    val b = Graph.pagerankMicro(edges.coalesce(1), "src", "dst", "w", iters = 3)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("zero iterations returns the uniform start vector") {
    val pr = Graph.pagerankMicro(edges, "src", "dst", "w", iters = 0)
    assert(pr.select("pr_micro").distinct().collect().map(_.getLong(0)).toSeq == Seq(1000000L))
  }

  test("broadcast-rank regime is bit-identical to the shuffle regime") {
    val shuffled = Graph.pagerankMicro(edges, "src", "dst", "w", iters = 3)
      .orderBy("id").collect().toSeq
    val bcast = Graph
      .pagerankMicro(edges, "src", "dst", "w", iters = 3, broadcastRanks = true)
      .orderBy("id").collect().toSeq
    assert(bcast == shuffled, "broadcast mode must not change a single rank")
  }
}

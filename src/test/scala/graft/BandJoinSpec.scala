package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** The custom range-partitioned band join ([[org.apache.spark.sql.graft
  * .BandJoinExec]]): pair-set parity against the built-in plan
  * (cartesian + BETWEEN filter), boundary semantics, and the physical
  * plan-shape pin.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(
      l: Seq[(Long, String)], r: Seq[(Long, String)], eps: Long): Set[(String, String)] =
    (for {
      (lk, lid) <- l
      (rk, rid) <- r
      if math.abs(lk - rk) <= eps
    } yield (lid, rid)).toSet

  test("bandJoin matches brute force on random keys across partition cuts") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (rnd.nextLong(2000L), s"l$i"))
    val r = (1 to 300).map(i => (rnd.nextLong(2000L), s"r$i"))
    val ldf = l.toDF("lk", "lid").repartition(5)
    val rdf = r.toDF("rk", "rid").repartition(3)
    for (eps <- Seq(0L, 3L, 50L)) {
      val got = Joins.bandJoin(ldf, rdf, "lk", "rk", eps)
        .select($"lid", $"rid").as[(String, String)].collect().toSet
      assert(got == brute(l, r, eps), s"eps=$eps")
    }
  }

  test("bandJoin boundary is inclusive and null keys never match") {
    val ldf = Seq((Some(10L), "a"), (None: Option[Long], "n")).toDF("lk", "lid")
    val rdf = Seq((Some(15L), "x"), (Some(16L), "y"), (None: Option[Long], "z"))
      .toDF("rk", "rid")
    val got = Joins.bandJoin(ldf, rdf, "lk", "rk", 5L)
      .select($"lid", $"rid").as[(String, String)].collect().toSet
    assert(got == Set(("a", "x")), "|10-15|=5 inclusive; 16 out; nulls drop")
  }

  test("bandJoin handles an empty left side (no bounds) and wide epsilon") {
    val empty = Seq.empty[(Long, String)].toDF("lk", "lid")
    val rdf = Seq((1L, "x")).toDF("rk", "rid")
    assert(Joins.bandJoin(empty, rdf, "lk", "rk", 10L).count() == 0L)
    // epsilon wider than the whole key span: full cross product
    val l2 = Seq((0L, "a"), (1000L, "b")).toDF("lk", "lid")
    val r2 = Seq((500L, "x"), (999L, "y")).toDF("rk", "rid")
    assert(Joins.bandJoin(l2, r2, "lk", "rk", 100000L).count() == 4L)
  }

  test("bandJoin plans through BandJoinExec, not a nested-loop join") {
    val ldf = Seq((1L, "a")).toDF("lk", "lid")
    val rdf = Seq((2L, "x")).toDF("rk", "rid")
    val plan = Joins.bandJoin(ldf, rdf, "lk", "rk", 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bandJoin rejects non-long keys and shared attributes") {
    val ldf = Seq((1, "a")).toDF("lk", "lid")
    val rdf = Seq((2L, "x")).toDF("rk", "rid")
    intercept[IllegalArgumentException] {
      Joins.bandJoin(ldf, rdf, "lk", "rk", 5L)
    }
    val shared = Seq((1L, "a")).toDF("lk", "lid")
    intercept[IllegalArgumentException] {
      Joins.bandJoin(shared, shared, "lk", "lk", 5L)
    }
  }
}

package graft

import graft.ops.{Joins, Windows}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for per-group top-k and co-visitation over
  * generated data (fixed seeds, deterministic).
  */
class TopKPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      score <- Gen.choose(0L, 5L) // narrow range forces ties
      id <- Gen.choose(0L, 1000L)
    } yield (g, score, id))
  } yield rows

  test("topKPerGroup: ≤k rows per group, max always included, deterministic ties") {
    (1 to 10).foreach { i =>
      val rows = rowsGen(Gen.Parameters.default, Seed(i.toLong)).get.distinct
      val df = rows.toDF("g", "score", "id")
      val top = Windows.topKPerGroup(df, Seq("g"), col("score"), Seq("id"), 3)
        .select("g", "score", "id", "rn").as[(String, Long, Long, Int)].collect()

      val byGroup = top.groupBy(_._1)
      byGroup.foreach { case (g, rs) =>
        assert(rs.length <= 3, s"seed $i: group $g has ${rs.length} rows")
        // rank-1 row must be the (max score, then min id among maxes)
        val all = rows.filter(_._1 == g)
        val best = all.maxBy { case (_, s, id) => (s, -id) }
        val r1 = rs.find(_._4 == 1).get
        assert((r1._2, r1._3) == ((best._2, best._3)),
          s"seed $i: rank-1 ${(r1._2, r1._3)} != expected ${(best._2, best._3)}")
      }
      // re-run must produce the identical set (deterministic ties)
      val top2 = Windows.topKPerGroup(df.repartition(7), Seq("g"), col("score"), Seq("id"), 3)
        .select("g", "score", "id", "rn").as[(String, Long, Long, Int)].collect()
      assert(top.toSet == top2.toSet, s"seed $i: ties unstable under repartition")
    }
  }

  test("covisitationPairs: symmetric-free, counts match brute force") {
    (1 to 6).foreach { i =>
      val rows = rowsGen(Gen.Parameters.default, Seed(100L + i)).get
        .map { case (g, s, id) => (g + s, id % 6) } // (session, item)
      val df = rows.toDF("session_id", "item_id")
      val got = Joins.covisitationPairs(df, "session_id", "item_id", minCount = 1L)
        .as[(Long, Long, Long)].collect().toSet

      val expected = rows.distinct
        .groupBy(_._1).values
        .flatMap { sess =>
          val items = sess.map(_._2).distinct.sorted
          for (a <- items; b <- items if a < b) yield (a, b)
        }
        .groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }
        .toSet
      assert(got == expected, s"seed $i: covis mismatch")
    }
  }
}

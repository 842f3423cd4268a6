package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Distributed sweep-line skyline: dominance fixtures (including the
  * tie cases the strict compare must get right), brute-force
  * equivalence on random point sets, layout invariance. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], parts: Int = 4): Set[(Long, Long, Long)] =
    Relational.skyline2D(rows.toDF("a", "b").repartition(parts),
        col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("skyline keeps the Pareto frontier, drops dominated points") {
    // minimize a, maximize b: (1,5) and (3,8) survive; (2,4) is
    // dominated by (1,5); (4,8) by (3,8); (5,1) by everything
    val got = run(Seq((1L, 5L), (2L, 4L), (3L, 8L), (4L, 8L), (5L, 1L)))
    assert(got == Set((1L, 5L, 1L), (3L, 8L, 1L)))
  }

  test("ties: equal-(a,b) rows aggregate, equal one-coordinate points resolve strictly") {
    // two rows AT the same point are mutual non-dominators: n = 2
    val dup = run(Seq((1L, 5L), (1L, 5L), (2L, 6L)))
    assert(dup == Set((1L, 5L, 2L), (2L, 6L, 1L)))
    // same a, different b: only the group max survives
    assert(run(Seq((1L, 5L), (1L, 7L))) == Set((1L, 7L, 1L)))
    // same b, different a: only the smaller a survives
    assert(run(Seq((1L, 5L), (2L, 5L))) == Set((1L, 5L, 1L)))
  }

  test("skyline equals the quadratic dominance check on random sets") {
    def brute(pts: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
      val grouped = pts.groupBy(identity).map { case (p, v) =>
        (p._1, p._2, v.size.toLong)
      }.toSeq
      grouped.filter { case (a, b, _) =>
        !grouped.exists { case (a2, b2, _) =>
          a2 <= a && b2 >= b && (a2 < a || b2 > b)
        }
      }.toSet
    }
    for (seed <- Seq(1, 8, 21); parts <- Seq(1, 9)) {
      val rnd = new scala.util.Random(seed)
      val pts = (1 to 400).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      assert(run(pts, parts) == brute(pts), s"seed $seed parts $parts")
    }
  }

  test("skyline survives downstream partition remapping (union with itself)") {
    // regression: the sweep's pass 2 once keyed offsets off
    // TaskContext.getPartitionId(), which a downstream union remaps
    val rnd = new scala.util.Random(12)
    val pts = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("a", "b")
    def sky = Relational.skyline2D(pts, col("a"), col("b"))
    val odd = sky.unionByName(sky)
      .groupBy("a", "b", "n").count().filter(col("count") =!= 2).count()
    assert(odd == 0, "both branches must read their own stored offsets")
  }

  test("degenerate inputs: empty set, single point, one axis constant") {
    assert(run(Seq.empty) == Set.empty)
    assert(run(Seq((7L, 7L))) == Set((7L, 7L, 1L)))
    // constant a: only max b survives; constant b: only min a survives
    assert(run((1L to 10L).map(b => (5L, b))) == Set((5L, 10L, 1L)))
    assert(run((1L to 10L).map(a => (a, 5L))) == Set((1L, 5L, 1L)))
  }
}

package graft

import graft.similarity.Knn

/** MMR re-ranking semantics: the redundancy penalty beats a plain
  * top-k on a near-dup-heavy pool, ties break to the lower id, and
  * rank 1 is pure relevance. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def ang(deg: Double) = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  /** Query on the x-axis, a near-dup pair 5° off it, one diverse
    * vector at 40°: plain top-2 returns both copies; MMR must spend
    * rank 2 on the diverse vector (its penalty vs the picked copy is
    * cos 45° ≈ 0.707, far below the duplicate's 1.0). */
  private lazy val nearDupPool = Seq(
    (0L, ang(0)),   // the query
    (1L, ang(-5)),  // best hit
    (2L, ang(-5)),  // exact duplicate of the best hit
    (3L, ang(40)))  // diverse, moderately relevant
    .toDF("vec_id", "embedding")

  test("redundancy penalty: the duplicate loses rank 2 to the diverse hit") {
    val out = Knn.mmrRerank(nearDupPool, nQueries = 1, poolSize = 3, k = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(1) == 1L, "rank 1 is pure relevance (ties to the lower id)")
    assert(out(2) == 3L,
      "rank 2 must be the diverse vector, not the duplicate of rank 1")
  }

  test("a plain top-2 would have returned the duplicate — MMR differs by design") {
    val top2 = Knn.bruteForce(nearDupPool, nQueries = 1, k = 2)
      .collect().map(_.getLong(2)).toSet
    assert(top2 == Set(1L, 2L), "relevance-only top-2 is the dup pair")
    val mmr2 = Knn.mmrRerank(nearDupPool, nQueries = 1, poolSize = 3, k = 2)
      .collect().map(_.getLong(2)).toSet
    assert(mmr2 == Set(1L, 3L))
  }

  test("rank-1 mmr equals the relevance score; later ranks are penalized") {
    val rows = Knn.mmrRerank(nearDupPool, nQueries = 1, poolSize = 3, k = 3)
      .collect().sortBy(_.getInt(1))
    // cos 5° = 0.99619… → round4 0.9962 → 9962 basis points
    assert(rows(0).getLong(3) == 9962L)
    // rank 2 (the 40° vector): rel cos40°=0.7660 minus sim cos45°=0.7071
    assert(rows(1).getLong(3) == 7660L - 7071L)
    // rank 3 (the duplicate): rel 9962 minus sim-to-copy 10000
    assert(rows(2).getLong(3) == 9962L - 10000L)
  }

  test("every query gets its own k picks") {
    val out = Knn.mmrRerank(nearDupPool, nQueries = 2, poolSize = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.length == 4)
    assert(out.groupBy(_._1).keySet == Set(0L, 1L))
    assert(out.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2)))
  }

  test("a 1-member pool still emits rank 1 (degenerate corpus)") {
    // two vectors total: query 0's pool is just vector 1, so the pool
    // pair self-join is EMPTY — pre-fix, flatMapGroups never saw the
    // group and the query silently produced no rows (ADVICE r9). The
    // seed rows from the pool relation itself restore rank 1, with
    // mmr = pure relevance (no selected partner to penalize against).
    val two = Seq((0L, ang(0)), (1L, ang(-5))).toDF("vec_id", "embedding")
    val rows = Knn.mmrRerank(two, nQueries = 1, poolSize = 3, k = 2).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 0L && rows.head.getInt(1) == 1 &&
      rows.head.getLong(2) == 1L && rows.head.getLong(3) == 9962L)
  }
}

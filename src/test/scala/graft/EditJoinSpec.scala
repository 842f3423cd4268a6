package graft

import org.apache.spark.sql.functions._

import graft.dedup.EditJoin

/** Ed-Join correctness: the prefix + length filters are LOSSLESS
  * (brute-force equivalence, short strings included — they exercise
  * the both-short pool where the gram bound is vacuous), and the
  * verified distances are exact. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(rows: Seq[(Long, String)], k: Int,
                  parts: Int = 4): Set[(Long, Long, Long)] =
    EditJoin.editJoin(rows.toDF("id", "s").repartition(parts),
        col("id"), col("s"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && lev(s1, s2) <= k
    } yield (i1, i2, lev(s1, s2).toLong)).toSet

  test("fixtures: exact dups, single edits, and the k boundary") {
    val rows = Seq((1L, "chocolate lace"), (2L, "chocolate lace"),
      (3L, "chocolate face"), (4L, "chocolate faces"),
      (5L, "something else entirely"))
    val got = run(rows, k = 2)
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 1L)),
      "kitten-style third edits stay out at k=2")
  }

  test("short strings route through the both-short pool losslessly") {
    // all under the q(k+1)=9-char cutoff for k=2 — the gram bound is
    // vacuous here, so only the dedicated pool can find these
    val rows = Seq((1L, "ab"), (2L, "b"), (3L, "abc"), (4L, "xyz"),
      (5L, "abcdefgh"), (6L, "abcdefghij"))
    assert(run(rows, k = 2) == brute(rows, k = 2))
    assert(run(rows, k = 1) == brute(rows, k = 1))
  }

  test("editJoin equals brute force on random strings, any partitioning") {
    for (seed <- Seq(4, 19); parts <- Seq(1, 7); k <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      // small alphabet + varied lengths (1..24) force collisions and
      // exercise both pools and the cross (short, long) pairs
      val rows = (1L to 120L).map { i =>
        val n = 1 + rnd.nextInt(24)
        (i, Seq.fill(n)("abcd".charAt(rnd.nextInt(4))).mkString)
      }
      assert(run(rows, k, parts) == brute(rows, k),
        s"seed $seed parts $parts k $k")
    }
  }

  test("null strings are dropped, empty input is safe") {
    val rows = Seq((1L, "abc"), (2L, null), (3L, "abd"))
      .toDF("id", "s")
    val got = EditJoin.editJoin(rows, col("id"), col("s"), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
    assert(EditJoin.editJoin(Seq.empty[(Long, String)].toDF("id", "s"),
      col("id"), col("s"), k = 2).count() == 0)
  }
}

package graft

/** Pins the determinism tool's compare itself: the round-9 ADVICE
  * found the old even-total-count test false-negatived when a row
  * appeared twice in run A and zero times in run B (total 2 — even —
  * "deterministic"). The per-run-multiplicity compare must catch it.
  */
class DetCheckSpec extends SparkSpec {
  import spark.implicits._

  test("equal multisets (any row order) diff to zero") {
    val a = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("id", "v")
    val b = Seq((2L, "y"), (1L, "x"), (2L, "y")).toDF("id", "v")
    assert(DetCheck.multisetDiff(a, b) == 0L)
  }

  test("a 2-vs-0 multiplicity split is CAUGHT (old even-count false negative)") {
    // same total row count, every per-row total even — the old check
    // passed this; multiset equality must not
    val a = Seq((1L, "x"), (1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y"), (2L, "y")).toDF("id", "v")
    assert(DetCheck.multisetDiff(a, b) == 2L,
      "both the 2-0 row and the 0-2 row must report")
  }

  test("a multiplicity change on one row reports exactly that row") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("id", "v")
    assert(DetCheck.multisetDiff(a, b) == 2L)
  }

  test("empty vs empty is deterministic; empty vs non-empty is not") {
    val e = Seq.empty[(Long, String)].toDF("id", "v")
    val x = Seq((1L, "x")).toDF("id", "v")
    assert(DetCheck.multisetDiff(e, e) == 0L)
    assert(DetCheck.multisetDiff(e, x) == 1L)
  }
}

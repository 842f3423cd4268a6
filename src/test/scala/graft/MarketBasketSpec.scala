package graft

import org.apache.spark.sql.functions._

import graft.operators.MarketBasket

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("pair rules: exact support/confidence/lift on a hand-built corpus") {
    // baskets: {A,B,C}, {A,B}, {A}, {C} -> 4 baskets
    // AB pairs in 2, AC/BC in 1; n(A)=3, n(B)=2, n(C)=2
    val items = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"),
      (4L, "C"),
      (2L, "A")) // duplicate row must not double-count
      .toDF("bk", "it")
    val rows = MarketBasket.pairRules(items, $"bk", $"it")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.head == (("A", "B", 2L, 0.5, 2.0 / 3 roundTo 8, 4.0 / 3 roundTo 8)))
    assert(rows.map(t => (t._1, t._2)).toSet ==
      Set(("A", "B"), ("A", "C"), ("B", "C")))
  }

  test("degenerate baskets are dropped before any pair expands") {
    val big = (1 to 100).map(i => (1L, s"i$i")) // one 100-item basket
    val ok = Seq((2L, "x"), (2L, "y"))
    val items = (big ++ ok).toDF("bk", "it")
    for (pre <- Seq(false, true)) {
      val rows = MarketBasket.pairRules(items, $"bk", $"it",
        maxBasket = 64, preGate = pre).collect()
      assert(rows.length == 1, s"preGate=$pre") // only the small basket pairs
      assert(rows(0).getString(0) == "x" && rows(0).getString(1) == "y")
      // and the dropped basket is excluded from the totals too
      assert(rows(0).getAs[Double]("support8") == 1.0)
    }
  }

  test("empty-input expectation report still reads zero violations") {
    import graft.operators.Expectations
    import graft.operators.Expectations.Rule
    val empty = Seq.empty[(Long, String)].toDF("k", "tag")
    val rows = Expectations.report(empty, Seq(Rule("k_pos", $"k" > 0L)))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 0L) // violations 0, not null
  }

  private implicit class RoundTo(d: Double) {
    def roundTo(scale: Int): Double =
      BigDecimal(d).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}

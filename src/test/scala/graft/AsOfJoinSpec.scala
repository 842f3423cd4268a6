package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.AsOfJoin

/** Native as-of join: semantics against a window-built reference
  * implementation, plan shape, and the edge cases a merge pass can
  * get wrong (ties, strictness, tolerance, unmatched keys, nulls,
  * partition boundaries). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (sym, qt, px) — bid updates; trades: (sym, tt, qty)
  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 10.0),
    ("C", 100L, 5.0)
  ).toDF("sym", "qt", "px")

  private def trades = Seq(
    ("A", 5L, 1L),   // before any quote -> null
    ("A", 20L, 2L),  // exact tie -> inclusive matches qt=20, strict matches qt=10
    ("A", 25L, 3L),  // between -> qt=20
    ("A", 99L, 4L),  // far after -> qt=30 (tolerance can kill it)
    ("B", 14L, 5L),  // just before B's only quote -> null
    ("B", 16L, 6L),  // just after -> qt=15
    ("D", 50L, 7L)   // key with no quotes -> null
  ).toDF("sym", "tt", "qty")

  private def keyed(strict: Boolean = false, tolUs: Option[Long] = None) =
    AsOfJoin.asof(
      trades,
      quotes.toDF("sym", "qt", "px"),
      on = Seq("sym"), leftTimeCol = "tt", rightTimeCol = "qt",
      strict = strict, toleranceUs = tolUs)
      .select($"qty", $"qt", $"px")

  test("keyed inclusive semantics (ties match, missing keys null)") {
    val got = keyed().collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> -1L, 2L -> 20L, 3L -> 20L, 4L -> 30L,
      5L -> -1L, 6L -> 15L, 7L -> -1L))
  }

  test("strict semantics exclude the same-instant right row") {
    val got = keyed(strict = true).collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(2L) === 10L)
    assert(got(3L) === 20L)
  }

  test("tolerance voids matches older than the bound") {
    val got = keyed(tolUs = Some(10L)).collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(4L) === -1L, "69-tick-old quote must not survive tol=10")
    assert(got(2L) === 20L)
    assert(got(6L) === 15L)
  }

  test("matches the window-composition reference on random data") {
    val n = 5000
    val left = spark.range(n).select(
      (col("id") % 37).as("k"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("t"),
      col("id").as("lid"))
    val right = spark.range(n / 2).select(
      (col("id") % 41).as("k"),
      pmod(hash(col("id") + 7), lit(100000)).cast("long").as("t"),
      col("id").as("rid"))
      // unique (k, t) so tie choice cannot differ between impls
      .groupBy("k", "t").agg(max("rid").as("rid"))
    val native = AsOfJoin.asof(left,
        right.toDF("k", "rt", "rid"),
        on = Seq("k"), leftTimeCol = "t", rightTimeCol = "rt")
      .select($"lid", $"rid")
    // reference: union tag + last(ignoreNulls) window, like
    // TimeSeries.asofPurchaseClick (right rows sort before left at
    // the same (k, t) => inclusive semantics)
    val tagged = right.select($"k", $"t", lit(null).cast("long").as("lid"),
        $"rid", lit(0).as("side"))
      .unionAll(left.select($"k", $"t", $"lid",
        lit(null).cast("long").as("rid"), lit(1).as("side")))
    val w = Window.partitionBy($"k").orderBy($"t", $"side", $"lid")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = tagged
      .withColumn("m", last($"rid", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"lid", $"m".as("rid"))
    assert(native.count() === n)
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "native as-of differs from window reference")
  }

  test("strict and tolerance variants match the window reference on random data") {
    val n = 3000
    val left = spark.range(n).select(
      (col("id") % 17).as("k"),
      pmod(hash(col("id") * 3 + 1), lit(5000)).cast("long").as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 19).as("k"),
      pmod(hash(col("id") * 7 + 2), lit(5000)).cast("long").as("t"),
      col("id").as("rid"))
      .groupBy("k", "t").agg(max("rid").as("rid"))
    for (strict <- Seq(false, true); tol <- Seq(None, Some(40L))) {
      val native = AsOfJoin.asof(left, right.toDF("k", "rt", "rid"),
          Seq("k"), "t", "rt", strict = strict, toleranceUs = tol)
        .select($"lid", $"rid", $"rt")
      // inclusive: right rows sort BEFORE left at equal t (visible);
      // strict: after (invisible) — the click-vs-purchase trick
      val sideOrd = if (strict) lit(-1) else lit(1)
      val tagged = right.select($"k", $"t", lit(null).cast("long").as("lid"),
          $"rid", lit(0).as("side"))
        .unionAll(left.select($"k", $"t", $"lid",
          lit(null).cast("long").as("rid"), lit(1).as("side")))
      val w = Window.partitionBy($"k")
        .orderBy($"t", $"side" * sideOrd, $"lid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val matchedRef = tagged
        .withColumn("m", last($"rid", ignoreNulls = true).over(w))
        .withColumn("mt", last(when($"side" === 0, $"t"), ignoreNulls = true).over(w))
        .filter($"side" === 1)
      val ref = matchedRef.select($"lid",
        when(tol.map(x => $"t" - $"mt" <= x).getOrElse(lit(true)), $"m").as("rid"),
        when(tol.map(x => $"t" - $"mt" <= x).getOrElse(lit(true)), $"mt").as("rt"))
      assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
        s"divergence at strict=$strict tol=$tol")
    }
  }

  test("SQL table-valued form: FROM graft_asof(...) runs the native exec") {
    trades.createOrReplaceTempView("graft_asof_trades")
    quotes.createOrReplaceTempView("graft_asof_quotes")
    val df = spark.sql(
      """SELECT qty, qt FROM graft_asof(
        |  'graft_asof_trades', 'graft_asof_quotes', 'sym', 'tt', 'qt')""".stripMargin)
    val got = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> -1L, 2L -> 20L, 3L -> 20L, 4L -> 30L,
      5L -> -1L, 6L -> 15L, 7L -> -1L))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // strict + tolerance through SQL
    val s = spark.sql(
      """SELECT qty, qt FROM graft_asof(
        |  'graft_asof_trades', 'graft_asof_quotes', 'sym', 'tt', 'qt',
        |  'strict', '10')""".stripMargin).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(s(2L) === 10L && s(4L) === -1L)
  }

  test("SQL form rejects a misspelled mode instead of silently joining inclusive") {
    trades.createOrReplaceTempView("graft_asof_trades")
    quotes.createOrReplaceTempView("graft_asof_quotes")
    val ex = intercept[IllegalArgumentException] {
      spark.sql(
        """SELECT * FROM graft_asof(
          |  'graft_asof_trades', 'graft_asof_quotes', 'sym', 'tt', 'qt',
          |  'stric')""".stripMargin)
    }
    assert(ex.getMessage.contains("'strict' or 'inclusive'"), ex.getMessage)
  }

  test("plan: one exchange + one sort per side feeding AsOfJoinExec") {
    val df = keyed()
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE dumps final + initial
    assert(p.contains("AsOfJoin"), s"native exec missing:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, plan:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts == 2, s"expected 2 sorts, plan:\n$p")
  }

  test("forward as-of matches the earliest quote at-or-after the trade") {
    def fwd(strict: Boolean = false, tol: Option[Long] = None) =
      AsOfJoin.asofForward(
          trades, quotes.toDF("sym", "qt", "px"),
          on = Seq("sym"), leftTimeCol = "tt", rightTimeCol = "qt",
          strict = strict, toleranceUs = tol)
        .select($"qty", $"qt").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fwd() === Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> -1L,
      5L -> 15L, 6L -> -1L, 7L -> -1L))
    // strict excludes the same-instant quote: trade 2 at t=20 must
    // skip the qt=20 quote and take qt=30
    assert(fwd(strict = true)(2L) === 30L)
    // tolerance bounds the forward gap (rt - lt): trade 3 at t=25 is
    // 5 ticks from qt=30 (kept at tol=5, voided at tol=4)
    assert(fwd(tol = Some(5L))(3L) === 30L)
    assert(fwd(tol = Some(4L))(3L) === -1L)
  }

  test("null keys match nothing (SQL equi-join semantics)") {
    val l = Seq((java.lang.Long.valueOf(1L), 10L, "a"),
      (null.asInstanceOf[java.lang.Long], 10L, "b"))
      .toDF("k", "t", "tag")
      .select($"k".cast("long").as("k"), $"t", $"tag")
    val r = Seq((java.lang.Long.valueOf(1L), 5L, "q1"),
      (null.asInstanceOf[java.lang.Long], 5L, "qnull"))
      .toDF("k", "rt", "rtag")
      .select($"k".cast("long").as("k"), $"rt", $"rtag")
    val got = AsOfJoin.asof(l, r, Seq("k"), "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(got === Map("a" -> "q1", "b" -> null),
      "null keys must not match each other")
  }

  test("left rows with null time get no match; null right times skipped") {
    val l = Seq((1L, java.lang.Long.valueOf(10L), "a"),
      (1L, null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "t", "tag")
      .select($"k", $"t".cast("long").as("t"), $"tag")
    val r = Seq((1L, java.lang.Long.valueOf(5L), "q1"),
      (1L, null.asInstanceOf[java.lang.Long], "qnull"))
      .toDF("k", "rt", "rtag")
      .select($"k", $"rt".cast("long").as("rt"), $"rtag")
    val got = AsOfJoin.asof(l, r, Seq("k"), "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toMap
    assert(got === Map("a" -> "q1", "b" -> null))
  }
}

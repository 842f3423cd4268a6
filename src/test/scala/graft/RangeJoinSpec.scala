package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned point-in-interval join vs the naive non-equi join on
  * adversarial inputs: unaligned intervals, bin-edge endpoints,
  * negative domains, overlapping intervals, empty matches. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the naive range join on random unaligned intervals") {
    val points = spark.range(2000).select(
      (pmod(hash(col("id")), lit(2000)).cast("double") - 1000.0).as("p"),
      col("id").as("pid"))
    val intervals = spark.range(300).select(
      (pmod(hash(col("id") + 5), lit(1800)).cast("double") - 900.0).as("lo"),
      col("id").as("iid"))
      .withColumn("hi", col("lo") + pmod(hash(col("iid") * 3), lit(250)).cast("double") / 3.0)
    val binned = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        binWidth = 37.0)
      .select($"pid", $"iid")
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid")
    assert(naive.count() > 0, "test data must produce matches")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "binned join diverges from the naive range join")
  }

  test("half-open boundary: hi is excluded, lo included, even on bin edges") {
    val points = Seq((0.0, 1L), (10.0, 2L), (20.0, 3L)).toDF("p", "pid")
    val intervals = Seq((0.0, 10.0, 10L), (10.0, 20.0, 20L)).toDF("lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)), s"got $got")
  }

  test("caller columns named like the working bin column survive") {
    // the internal bin key must pick a fresh name, not clobber these
    val points = Seq((5.0, 1L, "keepP")).toDF("p", "pid", "_graft_bin0")
    val intervals = Seq((0.0, 10.0, 10L, "keepI")).toDF("lo", "hi", "iid", "_graft_bin1")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
    assert(out.columns.count(_ == "_graft_bin0") == 1 &&
      out.columns.count(_ == "_graft_bin1") == 1, out.columns.mkString(","))
    val row = out.select($"_graft_bin0", $"_graft_bin1").head()
    assert((row.getString(0), row.getString(1)) === ("keepP", "keepI"))
  }

  test("an interval spanning more bins than the cap fails loudly") {
    val points = Seq((5.0, 1L)).toDF("p", "pid")
    val wide = Seq((0.0, 1e9, 1L)).toDF("lo", "hi", "iid")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, "p", "lo", "hi",
        binWidth = 1.0, maxBinsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("maxBinsPerInterval")),
      s"expected the bin-cap error, got: $ex")
  }

  test("SQL table-valued form matches the Column API and rejects bad args") {
    val points = spark.range(500).select(
      (pmod(hash(col("id")), lit(1000)).cast("double")).as("p"),
      col("id").as("pid"))
    val intervals = spark.range(80).select(
      (pmod(hash(col("id") + 5), lit(900)).cast("double")).as("lo"),
      col("id").as("iid"))
      .withColumn("hi", col("lo") + 45.0)
    points.createOrReplaceTempView("grj_points")
    intervals.createOrReplaceTempView("grj_intervals")
    val viaSql = spark.sql(
      """SELECT pid, iid FROM graft_rangejoin(
        |  'grj_points', 'grj_intervals', 'p', 'lo', 'hi', '37.0')""".stripMargin)
    val viaApi = RangeJoin.pointInInterval(points, intervals,
      "p", "lo", "hi", 37.0).select($"pid", $"iid")
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty,
      "SQL TVF diverges from the Column API")
    // identifier validation blocks non-identifier input
    val ex = intercept[Exception](spark.sql(
      """SELECT * FROM graft_rangejoin(
        |  'grj_points', 'grj_intervals', 'p); DROP TABLE x; --',
        |  'lo', 'hi', '37.0')""".stripMargin))
    assert(ex.getMessage.contains("invalid column name"), ex.getMessage)
  }

  test("intervalOverlap matches the brute-force overlap join exactly, once per pair") {
    val rnd = new scala.util.Random(21)
    val mk = (pfx: String) => (1 to 120).map { i =>
      val lo = rnd.nextInt(1000).toDouble
      (s"$pfx$i", lo, lo + 1 + rnd.nextInt(150))
    }
    val l = mk("L").toDF("lid", "lo1", "hi1")
    val r = mk("R").toDF("rid", "lo2", "hi2")
    val got = RangeJoin.intervalOverlap(l, r, "lo1", "hi1", "lo2", "hi2",
        binWidth = 40.0)
      .select($"lid", $"rid").collect().map(x => (x.getString(0), x.getString(1)))
    // exact-once: no duplicate pairs from multi-bin co-coverage
    assert(got.length == got.distinct.length, "a pair was emitted more than once")
    val brute = l.crossJoin(r)
      .where($"lo1" < $"hi2" && $"lo2" < $"hi1")
      .select($"lid", $"rid").collect().map(x => (x.getString(0), x.getString(1)))
    assert(got.toSet == brute.toSet)
    assert(got.nonEmpty)
  }

  test("graft_overlapjoin SQL TVF equals the Column API, and validates identifiers") {
    val rnd = new scala.util.Random(43)
    val l = (1 to 80).map { i =>
      val lo = rnd.nextInt(500).toDouble; (s"L$i", lo, lo + 1 + rnd.nextInt(60))
    }.toDF("lid", "lo1", "hi1")
    val r = (1 to 80).map { i =>
      val lo = rnd.nextInt(500).toDouble; (s"R$i", lo, lo + 1 + rnd.nextInt(60))
    }.toDF("rid", "lo2", "hi2")
    l.createOrReplaceTempView("goj_l")
    r.createOrReplaceTempView("goj_r")
    val viaSql = spark.sql(
      """SELECT lid, rid FROM graft_overlapjoin(
        |  'goj_l', 'goj_r', 'lo1', 'hi1', 'lo2', 'hi2', '25.0')""".stripMargin)
    val viaApi = RangeJoin.intervalOverlap(l, r, "lo1", "hi1", "lo2", "hi2", 25.0)
      .select($"lid", $"rid")
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty,
      "SQL TVF diverges from the Column API")
    val ex = intercept[Exception](spark.sql(
      """SELECT * FROM graft_overlapjoin(
        |  'goj_l', 'goj_r', 'lo1); DROP TABLE x; --', 'hi1', 'lo2', 'hi2',
        |  '25.0')""".stripMargin))
    assert(ex.getMessage.contains("invalid column name"), ex.getMessage)
  }

  test("intervalOverlap rejects colliding column names and spans over the cap") {
    val l = Seq(("a", 0.0, 10.0)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, l, "lo", "hi", "lo", "hi", 1.0)
    }
    val r = Seq(("b", 0.0, 1e9)).toDF("rid", "lo2", "hi2")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(l.toDF("id", "lo1", "hi1"), r,
        "lo1", "hi1", "lo2", "hi2", binWidth = 0.001, maxBinsPerInterval = 100)
        .collect()
    }
    assert(ex.getMessage.contains("spans more than"), ex.getMessage)
  }

  test("plan stays an equi-join: no nested-loop anywhere") {
    val points = spark.range(100).select(col("id").cast("double").as("p"),
      col("id").as("pid"))
    val intervals = Seq((0.0, 50.0, 1L), (50.0, 100.0, 2L)).toDF("lo", "hi", "iid")
    val df = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 25.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
  }

  test("gridEpsilonJoin: boundary inclusive, group and partition gates") {
    // (0,0)↔(3,4) is exactly d²=25=r² (inclusive); the same-group
    // twin and the other-partition twin must both be invisible
    val pts = Seq(
      (1L, 10L, 0L, 0, 0),
      (2L, 20L, 0L, 3, 4),   // pairs with 1
      (3L, 10L, 0L, 1, 1),   // same group as 1 → never pairs with 1
      (4L, 40L, 9L, 0, 1))   // other partition → invisible to all
      .toDF("id", "grp", "part", "x", "y")
    val got = RangeJoin.gridEpsilonJoin(pts, r = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // 1 sees 2 (d²=25) and 3? no — 3 shares group 10 with 1; but 2↔3
    // differ in group (20 vs 10, d²=13) so both see each other
    assert(got(1L) == (1L, 25))
    assert(got(2L) == (2L, 13))
    assert(got(3L) == (1L, 13))
    assert(!got.contains(4L))
  }

  test("gridEpsilonJoin: cross-cell neighbors are found (cell side = r)") {
    // (4,0) and (6,0): cells 0 and 1 at r=5, d²=4 — only the 3×3
    // neighborhood expansion can see across the cell wall
    val pts = Seq((1L, 1L, 0L, 4, 0), (2L, 2L, 0L, 6, 0))
      .toDF("id", "grp", "part", "x", "y")
    val got = RangeJoin.gridEpsilonJoin(pts, r = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 1L, 4), (2L, 1L, 4)))
  }

  test("gridEpsilonJoin: brute-force equivalence on random points") {
    val rnd = new scala.util.Random(7)
    val data = (1L to 400L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(3).toLong,
        rnd.nextInt(60), rnd.nextInt(100)))
    val r = 5
    val brute = (for {
      a <- data; b <- data
      if a._1 < b._1 && a._2 != b._2 && a._3 == b._3
      d2 = (a._4 - b._4) * (a._4 - b._4) + (a._5 - b._5) * (a._5 - b._5)
      if d2 <= r * r
      e <- Seq((a._1, d2), (b._1, d2))
    } yield e).groupBy(_._1).map { case (id, xs) =>
      id -> (xs.length.toLong, xs.map(_._2).min)
    }
    val got = RangeJoin.gridEpsilonJoin(
        data.toDF("id", "grp", "part", "x", "y"), r).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getInt(2))).toMap
    assert(got == brute)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Layout

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // a deliberately skewed left side: 90% of rows share key 1
  private lazy val skewed = (1 to 1000).map(i =>
    (if (i <= 900) 1L else (i % 50).toLong, i.toLong))
    .toDF("k", "v")
  private lazy val dim = (0L to 49L).map(k => (k, s"name_$k"))
    .toDF("k", "name")

  test("salted join result multiset equals the plain join, any nSalts") {
    val plain = skewed.join(dim, "k")
      .select($"k", $"v", $"name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    for (n <- Seq(1, 3, 8)) {
      val salted = Layout.saltedJoin(skewed, dim, "k", saltFactor = n)
        .select($"k", $"v", $"name").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(salted == plain, s"nSalts=$n")
    }
  }

  test("hot-key-only salting equals the plain join at ANY threshold") {
    val plain = skewed.join(dim, "k")
      .select($"k", $"v", $"name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    // thresholds spanning all-hot (1), the intended split (100: only
    // the 900-row key salts), and all-cold (never fires)
    for (t <- Seq(1L, 100L, Long.MaxValue)) {
      val got = Layout.saltedJoinHot(skewed, dim, "k",
          saltFactor = 4, minHotCount = t)
        .select($"k", $"v", $"name").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(got == plain, s"minHotCount=$t")
    }
  }

  test("bothSides: right-only-hot keys take the mirrored salted path, result identical") {
    // key 7 is hot ONLY on the right (600 rows); key 1 stays hot on
    // the left. Default detection would send key 7 down the cold path;
    // bothSides routes it through the mirrored (right-salted) join.
    // Equality with the plain join at several thresholds proves the
    // three-way key split (left-hot / right-only-hot / cold) is a
    // partition, not a filter.
    val fatRight = dim.unionByName(
      (1 to 600).map(i => (7L, s"dup_$i")).toDF("k", "name"))
    val plain = skewed.join(fatRight, "k")
      .select($"k", $"v", $"name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    for (t <- Seq(1L, 100L, Long.MaxValue)) {
      val got = Layout.saltedJoinHot(skewed, fatRight, "k",
          saltFactor = 4, minHotCount = t, bothSides = true)
        .select($"k", $"v", $"name").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(got == plain, s"minHotCount=$t")
    }
    // and the split itself: at t=100, key 1 is left-hot, key 7 right-only-hot
    val hotL = skewed.groupBy($"k").agg(count(lit(1)).as("c"))
      .filter($"c" >= 100L).select($"k").as[Long].collect().toSet
    val hotR = fatRight.groupBy($"k").agg(count(lit(1)).as("c"))
      .filter($"c" >= 100L).select($"k").as[Long].collect().toSet
    assert(hotL == Set(1L) && hotR == Set(7L))
  }

  test("hot-key split replicates ONLY the hot slice of the dim") {
    // with minHotCount=100 exactly one key (the 900-row key 1) is hot:
    // the salted branch must see a 1-row right side exploded 4×, the
    // cold branch the other 49 dim rows unreplicated — measured here
    // by the join output multiset (anything over-replicated would
    // duplicate result rows and fail the equality test above), and by
    // the hot set itself
    val hot = skewed.groupBy($"k").agg(count(lit(1)).as("_cnt"))
      .filter($"_cnt" >= 100L).select($"k").as[Long].collect().toSeq
    assert(hot == Seq(1L), s"expected only the skewed key hot: $hot")
  }

  test("the hot key spreads across salt partitions") {
    val l = skewed.withColumn("_salt",
      pmod(hash($"k", monotonically_increasing_id()), lit(8)))
    val saltsUsed = l.filter($"k" === 1L)
      .select(countDistinct($"_salt")).as[Long].collect()(0)
    assert(saltsUsed > 1L,
      "the 900-row hot key must land on more than one salt")
  }

  test("result is invariant though the SALT itself is partitioning-dependent") {
    // position-derived salts change under repartition; the join result
    // must not — that is the whole safety argument for salting
    val a = SkewJoin.revenueByPrioritySalted(
      Tables.lineitem(spark, sf("sf0.001")),
      Tables.orders(spark, sf("sf0.001")))
      .orderBy("o_orderpriority").collect().toSeq
    val b = SkewJoin.revenueByPrioritySalted(
      Tables.lineitem(spark, sf("sf0.001")).repartition(7),
      Tables.orders(spark, sf("sf0.001")).repartition(3))
      .orderBy("o_orderpriority").collect().toSeq
    assert(a == b)
  }

  test("revenue-by-priority through the salt matches the unsalted plan") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val o = Tables.orders(spark, sf("sf0.001"))
    val salted = SkewJoin.revenueByPrioritySalted(li, o)
      .orderBy("o_orderpriority").collect().toSeq
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Portable.exactSumProd(
          $"l_extendedprice", lit(1.0) - $"l_discount").as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic samplers: fraction accuracy, invariance under
  * physical layout, per-stratum size bounds. */
class SamplingSpec extends SparkSpec {

  test("bernoulli fraction lands near num/denom and is layout-stable") {
    val n = 100000
    val base = spark.range(n).select(col("id"))
    def ids(parts: Int): Set[Long] =
      Sampling.bernoulli(base.repartition(parts), col("id"), 1, 10)
        .collect().map(_.getLong(0)).toSet
    val s1 = ids(1)
    // binomial(100k, 0.1): sd ≈ 95 — accept ±5 sd
    assert(math.abs(s1.size - n / 10) < 500, s"got ${s1.size}")
    assert(s1 == ids(13), "sample must not depend on partitioning")
  }

  test("bernoulli thresholds nest: 1/10 ⊂ 5/10 ⊂ 10/10 = everything") {
    val base = spark.range(10000).select(col("id"))
    def ids(num: Int) = Sampling.bernoulli(base, col("id"), num, 10)
      .collect().map(_.getLong(0)).toSet
    val (a, h, all) = (ids(1), ids(5), ids(10))
    assert(all.size == 10000, "num=denom keeps everything")
    assert(a.subsetOf(h) && h.subsetOf(all))
    assert(a.size < h.size && h.size < all.size)
    // nested thresholds are what make disjoint train/test bands
    // possible: band [1/10, 5/10) = h -- a, provably disjoint from a
    assert((h -- a).intersect(a).isEmpty)
  }

  test("bernoulli rejects a denominator that would overflow the compare") {
    val base = spark.range(10).select(col("id"))
    intercept[IllegalArgumentException] {
      Sampling.bernoulli(base, col("id"), 1, 10000)
    }
  }

  test("bands partition the keyspace: disjoint, exhaustive, stable") {
    val base = spark.range(20000).select(col("id"))
    val bands = (0 until 4).map(i =>
      Sampling.band(base, col("id"), i, 4).collect().map(_.getLong(0)).toSet)
    assert(bands.map(_.size).sum == 20000, "bands must be exhaustive")
    for (i <- 0 until 4; j <- i + 1 until 4)
      assert(bands(i).intersect(bands(j)).isEmpty, s"bands $i,$j overlap")
    // band 0 is exactly the bernoulli(1,4) sample
    val bern = Sampling.bernoulli(base, col("id"), 1, 4)
      .collect().map(_.getLong(0)).toSet
    assert(bands(0) == bern)
  }

  test("stratified returns min(n, |stratum|) rows per stratum, ranked") {
    val df = spark.range(1000).select(
      (col("id") % 7).as("s"), col("id").as("k"))
      .union(spark.range(3).select(lit(99L).as("s"), col("id").as("k")))
    val got = Sampling.stratified(df, col("s"), col("k"), 5)
      .groupBy(col("s")).agg(count(lit(1)).as("c"), max(col("rnk")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    (0L until 7L).foreach(s => assert(got(s) == (5L, 5)))
    assert(got(99L) == (3L, 3), "small stratum keeps all rows")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic samplers: fraction accuracy, invariance under
  * physical layout, per-stratum size bounds. */
class SamplingSpec extends SparkSpec {

  test("weighted top-k is layout-stable and favors heavy weights") {
    val base = spark.range(10000).select(col("id"),
      // weights 1 or 100: the heavy 1% should dominate a size-100 sample
      when(pmod(col("id"), lit(100)) === 0, lit(100.0)).otherwise(lit(1.0))
        .as("w"))
    def pick(parts: Int): Seq[Long] =
      Sampling.weightedTopK(base.repartition(parts), col("id"), col("w"), 100)
        .collect().map(_.getLong(0)).toSeq
    val s1 = pick(1)
    assert(s1.size == 100 && s1 == pick(7),
      "weighted sample must not depend on partitioning")
    val heavy = s1.count(_ % 100 == 0)
    // threshold math: with τ the 100th-largest priority, E[light kept]
    // = 9900/τ and E[heavy kept] = 10000/τ ⇒ τ ≈ 199, ~50/50 split —
    // accept a generous band around it
    assert(heavy > 30 && heavy < 75, s"$heavy heavy rows selected, expected ~50")
    // the meaningful weighted property: per-item inclusion RATE of a
    // 100x-weight item is ~100x a light item's
    val lightRate = (s1.size - heavy) / 9900.0
    assert(heavy / 100.0 > 20 * lightRate,
      s"heavy rate ${heavy / 100.0} not >> light rate $lightRate")
  }

  test("PrioritySample aggregator equals the plan-level weighted top-k") {
    import graft.functions.Portable.hash52
    import org.apache.spark.sql.Encoders
    val base = spark.range(5000).select(col("id").cast("string").as("sid"),
      (pmod(col("id"), lit(9)) + 1).cast("double").as("w"))
      .withColumn("priority", col("w") /
        ((hash52(col("sid")) + lit(1L)).cast("double") / lit(4503599627370496.0)))
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.PrioritySample(25),
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble))
    def viaAgg(parts: Int): Seq[String] =
      base.repartition(parts).agg(agg(col("sid"), col("priority")).as("s"))
        .select(explode(col("s")).as("e")).select("e._1")
        .collect().map(_.getString(0)).toSeq
    val expect = Sampling.weightedTopK(base.drop("priority"),
        col("sid"), col("w"), 25)
      .collect().map(_.getString(0)).toSeq
    assert(viaAgg(1).sorted == expect.sorted, "aggregator diverges from top-k")
    assert(viaAgg(1) == viaAgg(13), "sample depends on partitioning")
    // and it composes with groupBy: one pass, k rows per group
    val grouped = base.withColumn("g", pmod(col("sid").cast("long"), lit(4)))
      .groupBy(col("g")).agg(agg(col("sid"), col("priority")).as("s"))
      .select(col("g"), size(col("s")).as("n")).collect()
    assert(grouped.forall(_.getInt(1) == 25))
  }

  test("per-group weighted sample returns k rows per stratum, layout-stable") {
    val base = spark.range(3000).select(col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"),
      (pmod(col("id"), lit(7)) + 1).cast("double").as("w"))
    def run(parts: Int) =
      Sampling.weightedTopKPerGroup(base.repartition(parts),
          col("g"), col("id"), col("w"), 4)
        .select(col("g"), col("rnk"), col("id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val s = run(1)
    assert(s == run(11), "per-group sample must not depend on partitioning")
    val perGroup = s.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGroup == Map("0" -> 4, "1" -> 4, "2" -> 4), s"$perGroup")
  }

  test("per-group weighted sample plans with a window group limit") {
    val base = spark.range(2000).select(col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"), lit(1.0).as("w"))
    val df = Sampling.weightedTopKPerGroup(base, col("g"), col("id"),
      col("w"), 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed to a group limit:\n$p")
  }

  test("weighted top-k plans as TakeOrderedAndProject, not a global sort") {
    val base = spark.range(1000).select(col("id"), lit(1.0).as("w"))
    val df = Sampling.weightedTopK(base, col("id"), col("w"), 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

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

  test("temperature targets: sqrt-damped shares, exact arithmetic, partition-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // head source 1600 docs, tail source 100: proportional share would
    // be 16:1, sqrt-damped share is 4:1
    val docs = ((1 to 1600).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (10000L + i, "small"))).toSeq
      .toDF("doc_id", "source")
    def run(parts: Int) = Sampling.temperatureTargets(
      docs.repartition(parts), total = 500L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(1)
    assert(got == run(7))
    val (bigT, smallT) = (got("big")._2, got("small")._2)
    // sqrt weights 40:10 → targets 400:100 (floor division exact here)
    assert(bigT == 400L && smallT == 100L, s"got big=$bigT small=$smallT")
    // damped: the small source's share (1/5) far exceeds its
    // proportional row share (100/1700)
    assert(smallT.toDouble / (bigT + smallT) > 100.0 / 1700.0 * 2)
  }

  test("balanced downsample equalizes every class at the minority count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 130).map(i => (i.toLong, "b")) ++
      (131 to 137).map(i => (i.toLong, "c"))).toDF("id", "cls")
    val kept = Sampling.balanced(df, $"cls", $"id")
    val byCls = kept.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // minority class c has 7 rows; every class keeps exactly 7
    assert(byCls == Map("a" -> 7L, "b" -> 7L, "c" -> 7L))
    // minority rows all survive
    assert(kept.filter($"cls" === "c").count() == 7)
    // selection is partitioning-invariant
    val again = Sampling.balanced(df.repartition(7), $"cls", $"id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("budgetSelect: greedy best-first prefix, exact boundary, edge budgets") {
    import spark.implicits._
    // scores = ids, cost 10 each: budget 35 fits the top 3 (ids 9,8,7)
    val df = (0L until 10L).map(i => (i, i, 10L)).toDF("id", "sc", "c")
    val got = Sampling.budgetSelect(df, $"id", $"sc", $"c", 35L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == Map(9L -> 10L, 8L -> 20L, 7L -> 30L))
    // exact boundary is INCLUSIVE
    val exact = Sampling.budgetSelect(df, $"id", $"sc", $"c", 30L)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(9L, 8L, 7L))
    assert(Sampling.budgetSelect(df, $"id", $"sc", $"c", 0L).count() == 0)
    assert(Sampling.budgetSelect(df, $"id", $"sc", $"c", 1L).count() == 0,
      "a budget smaller than the first cost selects nothing")
    assert(Sampling.budgetSelect(df, $"id", $"sc", $"c", 1000L).count() == 10,
      "a budget above the corpus total selects everything")
    // score ties break toward the smaller id
    val tied = Seq((1L, 5L, 10L), (2L, 5L, 10L), (3L, 5L, 10L))
      .toDF("id", "sc", "c")
    assert(Sampling.budgetSelect(tied, $"id", $"sc", $"c", 20L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("budgetSelect rejects negative costs (prefix cut assumes monotone sums)") {
    import spark.implicits._
    // a negative cost breaks the takeWhile cut AND the offset-based
    // partition skip (a skipped partition could come back under
    // budget) — the guard rides pass 1's aggregate (ADVICE r9)
    val df = Seq((1L, 9L, 10L), (2L, 8L, -5L), (3L, 7L, 10L))
      .toDF("id", "sc", "c")
    val e = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df, $"id", $"sc", $"c", 100L).collect()
    }
    assert(e.getMessage.contains("costs must be >= 0"))
    // zero-cost rows remain legal
    val zero = Seq((1L, 9L, 0L), (2L, 8L, 10L)).toDF("id", "sc", "c")
    assert(Sampling.budgetSelect(zero, $"id", $"sc", $"c", 10L).count() == 2L)
  }

  test("budgetSelect survives downstream partition remapping (union with itself)") {
    import spark.implicits._
    // regression: pass 2 once keyed offsets off TaskContext
    // .getPartitionId(), which a downstream union remaps — every row
    // must appear exactly twice when the query unions with itself
    val df = (0L until 500L).map(i => (i, i % 37, (i % 11) + 1))
      .toDF("id", "sc", "c")
    val one = Sampling.budgetSelect(df, $"id", $"sc", $"c", 600L)
    val two = Sampling.budgetSelect(df, $"id", $"sc", $"c", 600L)
    val odd = one.unionByName(two)
      .groupBy("doc_id", "score", "cost", "cum_cost").count()
      .filter(col("count") =!= 2).count()
    assert(odd == 0, "both branches must read their own stored offsets")
  }

  test("budgetSelect equals the single-node cumsum on random data, any partitioning") {
    import spark.implicits._
    for (seed <- Seq(2, 9); parts <- Seq(1, 13)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 1000L).map(i =>
        (i, rnd.nextInt(50).toLong, rnd.nextInt(30).toLong))
      val budget = 3000L
      val expect = rows.sortBy { case (i, s, _) => (-s, i) }
        .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (i, s, c)) =>
          (i, s, c, cum + c)
        }.drop(1).takeWhile(_._4 <= budget).map(t => (t._1, t._4)).toMap
      val got = Sampling.budgetSelect(
          rows.toDF("id", "sc", "c").repartition(parts),
          $"id", $"sc", $"c", budget)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(got == expect, s"seed $seed parts $parts")
    }
  }

  test("streaming reservoir: per-batch priority-sample fold equals the batch sample") {
    // priority sampling is MERGEABLE: folding top-k(state ∪ batch)
    // per micro-batch holds a bounded k-row state yet ends exactly
    // where one batch pass over the whole stream would — the
    // streaming reservoir contract (priorities are pure functions of
    // (key, weight), so refolding recomputes identical values)
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val k = 8
    val in = MemoryStream[(Long, Double)](spark)
    var state = Seq.empty[(Long, Double)].toDF("key", "w")
    val query = in.toDF().toDF("key", "w")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = graft.operators.Sampling.weightedTopK(
            state.unionByName(batch), col("key"), col("w"), k)
          .select(col("key"), col("w")).localCheckpoint()
        ()
      }.start()
    val rnd = new scala.util.Random(31)
    val batches = (1 to 3).map(b =>
      (1 to 40).map(i => ((b * 100 + i).toLong, rnd.nextInt(50) + 1.0)))
    try {
      batches.foreach { rows => in.addData(rows: _*); query.processAllAvailable() }
      val streamed = state.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val all = batches.flatten.toDF("key", "w")
      val batchSample = graft.operators.Sampling
        .weightedTopK(all, col("key"), col("w"), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(streamed == batchSample)
      assert(streamed.size == k)
    } finally query.stop()
  }
}

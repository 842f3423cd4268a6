package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable.hash52

/** Deterministic sampling for training-data pipelines.
  *
  * Both samplers key off the portable 52-bit md5-prefix hash instead
  * of an RNG: the sample is a pure function of row identity — stable
  * under retries, repartitioning, and engine changes (the DuckDB
  * oracle reproduces it row-for-row), and composable (the same row
  * lands in the same split everywhere, which is what train/test
  * separation actually requires at 100 TB — no seed coordination
  * across executors). Plain filters/windows: pushdown-friendly, no
  * driver round-trips.
  */
object Sampling {

  /** Keep a row iff hash(key)/2^52 < num/denom — an exact integer
    * comparison (`hash * denom < num * 2^52`), no float thresholds.
    * Expected sample fraction num/denom. `denom` is capped at 1024 so
    * both products stay below 2^63 (hash is 52-bit): Spark's non-ANSI
    * multiply would silently wrap, the oracle engine would raise. */
  def bernoulli(df: DataFrame, key: Column, num: Int, denom: Int): DataFrame = {
    require(num > 0 && denom > 0 && num <= denom, "need 0 < num <= denom")
    require(denom <= 1024, "denom > 1024 overflows the 64-bit comparison")
    df.filter(
      hash52(key) * lit(denom.toLong) < lit(num.toLong) * lit(4503599627370496L))
  }

  /** Deterministic fold assignment: rows where
    * i/n ≤ hash(key)/2^52 < (i+1)/n. The n bands partition the
    * keyspace — every row lands in exactly one — which is what
    * train/validation/test splits and cross-validation folds need:
    * disjointness holds across engines, retries, and table versions,
    * because membership is a pure function of the key. */
  def band(df: DataFrame, key: Column, i: Int, n: Int): DataFrame = {
    require(n > 0 && i >= 0 && i < n, "need 0 <= i < n")
    require(n <= 1024, "n > 1024 overflows the 64-bit comparison")
    val h = hash52(key) * lit(n.toLong)
    val scale = lit(4503599627370496L)
    df.filter(h >= lit(i.toLong) * scale && h < lit((i + 1).toLong) * scale)
  }

  /** Deterministic dataset mixing: compose a corpus to target source
    * proportions — the training-data staple ("40% web, 30% books, …").
    * Each listed source contributes its `round(weight × total)`
    * lowest-hash documents (unique-key tiebreak), so the mixture is a
    * pure function of the keys: re-runs, engines and table versions
    * agree row-for-row, and a source with fewer documents than its
    * target contributes what it has. Unlisted sources drop out via
    * the broadcast inner join. Plans as one broadcast join + one
    * rank-filter window (InferWindowGroupLimit prunes partitions to
    * the target before the sort) — no full-corpus shuffle beyond the
    * per-source rank. */
  def mixSources(docs: DataFrame, weights: Seq[(String, Double)],
                 total: Int): DataFrame = {
    require(total > 0 && weights.nonEmpty, "need weights and total > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = weights.map { case (s, w) => (s, math.round(w * total)) }
    val targets = counts.toDF("source", "target")
    val w = Window.partitionBy(col("source"))
      .orderBy(hash52(col("doc_id")), col("doc_id"))
    docs.join(broadcast(targets), "source")
      .withColumn("rnk", row_number().over(w))
      // the LITERAL max-target bound is what lets Spark infer a window
      // group limit (per-partition rank pruning BEFORE the full sort);
      // the per-source column bound then refines it — a column-only
      // bound would compute full ranks for every partition
      .filter(col("rnk") <= lit(counts.map(_._2).max) &&
        col("rnk") <= col("target"))
      .select(col("source"), col("rnk"), col("doc_id"))
  }

  /** Temperature-balanced mixing targets: target_s ∝ n_s^α with
    * α = 0.5 — the standard rebalancing for multilingual/multi-source
    * corpora (upweight small sources, damp the head) at the one α
    * that stays ENGINE-EXACT: sqrt is correctly rounded under
    * IEEE-754 in every engine, unlike pow/log. The sqrt weight is
    * floored into a scaled integer, the weight total is an exact
    * BIGINT sum (1-row broadcast), and each target is a floor
    * division — no float accumulation anywhere, so the mixture is
    * reproducible across runs, partitionings and engines. Returns
    * (source, n, target). */
  def temperatureTargets(docs: DataFrame, total: Long,
                         scale: Long = 1000000L): DataFrame = {
    require(total > 0 && scale > 0, "temperatureTargets: total, scale > 0")
    val weighted = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w_int",
        floor(sqrt(col("n").cast("double")) * scale).cast("long"))
    // 1-row aggregate side: broadcast explicitly so the plan never
    // depends on AQE noticing the single-row side
    weighted.crossJoin(broadcast(weighted.agg(sum("w_int").as("w_sum"))))
      .select(col("source"), col("n"),
        expr(s"(${total}L * w_int) div w_sum").as("target"))
  }

  /** Fixed-size deterministic per-stratum sample: the `n` rows with
    * the smallest key hashes in each stratum (unique-key tiebreak).
    * Plans as a rank-filter window — Spark's InferWindowGroupLimit
    * prunes each partition to n rows before the full sort. */
  def stratified(df: DataFrame, strata: Column, key: Column,
                 n: Int): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(hash52(key), key)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
  }

  /** Deterministic weighted sample of fixed size k — priority
    * sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007): each row gets
    * priority w/u with u uniform on (0,1], and the k highest
    * priorities win, so inclusion probability scales with weight.
    *
    * u := (hash52(key)+1) / 2^52 is EXACT (numerator ≤ 2^52 is
    * representable, dividing by a power of two is lossless), and
    * w/u is a single correctly-rounded IEEE division — unlike
    * exponential-jitter schemes (pow/ln are not correctly rounded and
    * can differ across libm implementations), the priority is
    * bit-identical in any IEEE-754 engine, so the selected set is
    * value-exact reproducible in the DuckDB oracle.
    *
    * Plans as TakeOrderedAndProject: per-partition top-k then a
    * k-row driver merge — no global sort, no shuffle of the input. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column,
                   k: Int): DataFrame = {
    require(k > 0, "need k > 0")
    val u = (hash52(key) + lit(1L)).cast("double") / lit(4503599627370496.0)
    df.withColumn("priority", weight.cast("double") / u)
      .orderBy(col("priority").desc, key)
      .limit(k)
  }

  /** Per-stratum priority sampling: [[weightedTopK]] within each
    * `strata` group — the balanced-corpus pattern (e.g. k docs per
    * language, weighted by quality/length) that a global top-k gets
    * wrong whenever one stratum dominates the weight mass. Plans as
    * a rank-filter window; InferWindowGroupLimit caps each partition
    * at k rows before the sort completes. */
  def weightedTopKPerGroup(df: DataFrame, strata: Column, key: Column,
                           weight: Column, k: Int): DataFrame = {
    require(k > 0, "need k > 0")
    val u = (hash52(key) + lit(1L)).cast("double") / lit(4503599627370496.0)
    val w = Window.partitionBy(strata)
      .orderBy(col("priority").desc, key)
    df.withColumn("priority", weight.cast("double") / u)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic training-order shuffle + sharding — the
    * reshuffle-per-epoch primitive: every row gets a seeded 52-bit
    * hash position, its shard is the hash's high-order quotient
    * (range partitioning on a uniform key, so shards balance without
    * counting first), and its within-shard position is the hash rank.
    * The permutation is a pure function of (seed, key): identical
    * under retries, input partitioning, and engine (the oracle
    * replays it row-for-row); a different seed is an independent
    * permutation. One window shuffle on shard — shard-local sorts,
    * never a global total order, which is exactly how a 100 TB epoch
    * order has to be materialized (each shard is one reader's
    * sequential slice). nShards is capped so `hash * nShards` stays
    * inside int64 (hash < 2^52). */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int = 4,
                    seed: Int = 42): DataFrame = {
    require(nShards >= 1 && nShards <= 1024, "nShards in [1, 1024]")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), key)
    df.withColumn("h", hash52(concat_ws(":", lit(seed), key)))
      .withColumn("shard", expr(s"(h * $nShards) div 4503599627370496"))
      .withColumn("pos", row_number().over(w))
  }

  /** Class-balanced downsample: every class keeps exactly the
    * MINORITY class's row count — the standard rebalancing move
    * before training on skewed labels. Selection is the smallest
    * key-hashes per class ([[stratified]]'s rule), so the kept set
    * is deterministic, partitioning-invariant, and oracle-exact; the
    * cap itself comes FROM the data (a 1-row broadcast of
    * min(class count)), not from a caller guess.
    *
    * Plan shape: one map-side-combinable count pass collapses to a
    * single row, broadcast against the rank-filter window — the data
    * is shuffled once (the per-class window), the cap never moves
    * more than 8 bytes. */
  def balanced(df: DataFrame, cls: Column, key: Column): DataFrame = {
    val cap = df.groupBy(cls.as("_c")).agg(count(lit(1)).as("_n"))
      .agg(min(col("_n")).as("_m"))
    val w = Window.partitionBy(cls).orderBy(hash52(key), key)
    df.withColumn("rnk", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("rnk") <= col("_m"))
      .drop("_m")
  }

  /** Budget-bounded best-first selection: take rows in (`score` desc,
    * `id` asc) order while the running sum of `cost` stays ≤ `budget`
    * — "fill a token budget with the best documents", the corpus-
    * selection step a fixed training-compute plan needs. All three
    * columns must be integer-valued (cast to long); returns
    * (doc_id, score, cost, cum_cost) for the selected prefix.
    *
    * Scale shape — a distributed prefix sum, NOT a global window: a
    * running total over one global ORDER BY would plan as a single
    * unbounded window partition (one task owns the whole corpus).
    * Instead the corpus range-sorts once (Spark's distributed sort),
    * pass 1 reduces each partition to ONE subtotal (collected:
    * #partitions longs on the driver), the exclusive prefix offsets
    * broadcast back, and pass 2 streams each partition once adding
    * its offset — partitions whose offset already exceeds the budget
    * return without reading a row. Result is independent of the range
    * boundaries (the global order is total via the id tie-break), so
    * skewed sampling can only hurt balance, never the answer. */
  def budgetSelect(df: DataFrame, id: Column, score: Column, cost: Column,
                   budget: Long): DataFrame = {
    require(budget >= 0L, "budgetSelect: budget must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    // the partition id is FROZEN as a column when the checkpoint
    // materializes, and pass 2 keys its offset lookup off the stored
    // value — never TaskContext.getPartitionId(), which reports the
    // task's index in the DOWNSTREAM plan and silently remaps under
    // union/coalesce (a real bug graft.DetCheck caught: the same
    // query unioned with itself read wrong offsets on one branch)
    val ordered = df.select(id.cast("long").as("doc_id"),
        score.cast("long").as("score"), cost.cast("long").as("cost"))
      .repartitionByRange(col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("score").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = true) // two passes read one layout
      .as[(Long, Long, Long, Int)]
    val nParts = ordered.rdd.getNumPartitions
    // costs must be non-negative: a negative cost breaks BOTH the
    // takeWhile prefix cut (the running sum is no longer monotone)
    // and the offset-based partition skip (a partition whose
    // exclusive offset exceeds the budget is skipped even though a
    // later negative-cost row could bring the sum back under). The
    // check rides pass 1's existing per-partition aggregate — no
    // extra corpus pass.
    val byPidRows = ordered.groupBy(col("pid"))
      .agg(sum(col("cost")).as("t"), min(col("cost")).as("mn"))
      .collect()
    val minCost = byPidRows.foldLeft(Long.MaxValue)((m, r) =>
      math.min(m, r.getLong(2)))
    require(byPidRows.isEmpty || minCost >= 0L,
      s"budgetSelect: costs must be >= 0 (saw $minCost); filter or " +
        "clamp negative costs upstream — the prefix cut assumes a " +
        "monotone running sum")
    val byPid = byPidRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val subtotals = (0 until nParts).map(byPid.getOrElse(_, 0L))
    val offsets = spark.sparkContext.broadcast(
      subtotals.scanLeft(0L)(_ + _).toArray) // total BEFORE partition i
    ordered.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        var run = offsets.value(buf.head._4)
        if (run > budget) Iterator.empty
        else buf.map { case (i, s, c, _) => run += c; (i, s, c, run) }
          .takeWhile(_._4 <= budget)
      }
    }.toDF("doc_id", "score", "cost", "cum_cost")
  }
}

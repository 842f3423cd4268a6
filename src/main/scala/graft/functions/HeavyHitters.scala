package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items summary as a typed [[Aggregator]] —
  * bounded-state candidate generation for distributed heavy hitters
  * (Misra & Gries, "Finding repeated elements", Sci. Comp. Prog.
  * 1982; mergeability per Agarwal et al., "Mergeable summaries",
  * PODS 2012).
  *
  * Buffer = (counter map of ≤ `capacity` items, rows processed,
  * accumulated decrement `err`). Guarantees after any merge tree:
  * every item with true frequency > err is present in the map, and
  * err ≤ n/(capacity+1). The map's counts and err are
  * merge-order-dependent (estimates, not used downstream); only the
  * KEY SET and the guarantees matter — [[HeavyHitters.exactTopK]]
  * re-counts candidates exactly, so nothing order-dependent leaks
  * into results.
  *
  * Scale posture: the exchange carries ≤ `capacity` (string, long)
  * pairs per partition regardless of cardinality — the same reason
  * KMV beats collect_set (see [[KmvSketch]]).
  */
class MisraGries(capacity: Int)
  extends Aggregator[String, (Map[String, Long], Long, Long),
                     (Seq[String], Long, Long)] {
  require(capacity >= 1, "MisraGries needs capacity >= 1")

  override def zero: (Map[String, Long], Long, Long) = (Map.empty, 0L, 0L)

  override def reduce(b: (Map[String, Long], Long, Long),
                      item: String): (Map[String, Long], Long, Long) = {
    val (m, n, err) = b
    if (m.contains(item)) (m.updated(item, m(item) + 1), n + 1, err)
    else if (m.size < capacity) (m.updated(item, 1L), n + 1, err)
    // decrement-all: every tracked count and the arriving item each
    // lose 1 — any item's true count is under-represented by ≤ err+1
    else (m.collect { case (k, v) if v > 1 => k -> (v - 1) }, n + 1, err + 1)
  }

  override def merge(a: (Map[String, Long], Long, Long),
                     b: (Map[String, Long], Long, Long)): (Map[String, Long], Long, Long) = {
    val combined = (a._1.keySet ++ b._1.keySet).iterator
      .map(k => k -> (a._1.getOrElse(k, 0L) + b._1.getOrElse(k, 0L)))
      .toMap
    if (combined.size <= capacity) (combined, a._2 + b._2, a._3 + b._3)
    else {
      // subtract the (capacity+1)-th largest count, drop non-positive;
      // the subtraction adds `cut` to the undercount bound
      val cut = combined.values.toIndexedSeq
        .sorted(Ordering[Long].reverse).apply(capacity)
      (combined.collect { case (k, v) if v > cut => k -> (v - cut) },
        a._2 + b._2, a._3 + b._3 + cut)
    }
  }

  /** (sorted candidate keys, total rows, error bound err) — any item
    * NOT in the candidate set has true count ≤ err; sorted for
    * determinism of anything that iterates the candidates. */
  override def finish(r: (Map[String, Long], Long, Long)): (Seq[String], Long, Long) =
    (r._1.keys.toSeq.sorted, r._2, r._3)

  override def bufferEncoder: Encoder[(Map[String, Long], Long, Long)] =
    Encoders.kryo[(Map[String, Long], Long, Long)]
  // a real struct<_1:array<string>,_2:bigint,_3:bigint> column, not
  // kryo binary — downstream plans explode the candidate key-set on
  // executors (see exactTopKPerGroup) instead of collecting and
  // decoding sketches on the driver
  override def outputEncoder: Encoder[(Seq[String], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Exact distributed top-k by frequency without a full-cardinality
  * shuffle — the standard two-phase heavy-hitters pattern:
  *
  *   1. one [[MisraGries]] sketch pass (bounded state, map-side
  *      partials) yields ≤ `capacity` candidate items + the row count;
  *   2. an exact `groupBy(candidates).count` pass — the aggregation
  *      hash table now holds ≤ `capacity` groups instead of the full
  *      item cardinality, and the `isin` prefilter drops non-candidate
  *      rows BEFORE the exchange.
  *
  * At 100 TB / billions of distinct items, phase 2's shuffle carries
  * only candidate rows, vs. a full `groupBy(item)` whose hash tables
  * and exchange scale with distinct-item cardinality.
  *
  * Correctness is certifiable a posteriori: MG guarantees every item
  * whose true count exceeds the accumulated decrement bound `err`
  * (≤ n/(capacity+1)) is a candidate, so if the k-th exact candidate
  * count exceeds `err`, NO non-candidate can displace it and the
  * top-k is provably the global exact top-k. [[exactTopKCertified]]
  * enforces the certificate (specs run it); [[exactTopK]] returns the
  * lazy plan and leaves the proof to the caller/oracle gate.
  */
object HeavyHitters {

  /** (candidate keys, total row count, error bound) from one MG pass. */
  def candidates(items: DataFrame, itemCol: String,
                 capacity: Int): (Seq[String], Long, Long) = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string")).na.drop()
      .as[String]
      .select(new MisraGries(capacity).toColumn)
      .head()
  }

  /** STREAMING heavy hitters: the same [[MisraGries]] summary
    * maintained as streaming aggregation state — one state row whose
    * size is bounded by `capacity` regardless of how long the stream
    * runs or how many distinct items it carries (the property that
    * makes a streaming top-k possible at all; an exact streaming
    * `groupBy(item).count` grows state with distinct-item
    * cardinality). Update mode: every micro-batch folds into the
    * summary through the SAME reduce/merge the batch path uses, so a
    * stream's candidates agree with a batch re-sketch of the same
    * data. Output per batch: one row (candidates, n, err) —
    * certify against an exact recount downstream exactly like
    * [[exactTopKCertified]]. */
  def streamingCandidates(items: DataFrame, itemCol: String,
                          capacity: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string")).na.drop()
      .as[String]
      .select(new MisraGries(capacity).toColumn.name("mg"))
      // the typed column flattens the tuple to _1/_2/_3
      .select(col("_1").as("candidates"), col("_2").as("n"),
        col("_3").as("err"))
  }

  /** STREAMING approximate distinct count — the [[KmvSketch]] as
    * streaming aggregation state, same bounded-state argument as
    * [[streamingCandidates]]: one row of ≤ k hashes no matter how
    * many distinct items ever flow (streaming `approx_count_distinct`
    * keeps HLL registers; this keeps the engine-portable KMV form the
    * batch oracle gate already certifies — stream and batch agree on
    * the same data by merge associativity, property-tested). Update
    * the sink per batch; the estimate is exact below k. */
  def streamingDistinct(items: DataFrame, itemCol: String,
                        k: Int = 64): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(
        graft.functions.Portable.hash52(col(itemCol).cast("string")).as("h"))
      .as[Long]
      .select(new KmvSketch(k).toColumn.name("est"))
      .select(round(col("est"), 2).as("approx_distinct"))
  }

  private def exactCounts(items: DataFrame, itemCol: String, k: Int,
                          cands: Seq[String]): DataFrame =
    items.filter(col(itemCol).isin(cands: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(itemCol))
      .limit(k)

  /** Exact top-k items by count (ties broken by item value), computed
    * with the two-phase sketch + re-count pattern above. */
  def exactTopK(items: DataFrame, itemCol: String, k: Int,
                capacity: Int = 4096): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val (cands, _, _) = candidates(items, itemCol, capacity)
    exactCounts(items, itemCol, k, cands)
  }

  /** Per-group exact top-k: one MG sketch PER GROUP in a single
    * aggregation pass (bounded state per group), then one exact
    * re-count semi-joined to the UNION of all groups' candidates. The
    * union filter is sound: each group's true top-k is inside its own
    * candidate set (MG guarantee), and a candidate borrowed from
    * another group gets an exact count too, so it ranks exactly where
    * it belongs. The exchange carries ≤ capacity items per (partition,
    * group) in phase 1 and only candidate rows in phase 2.
    *
    * The candidate set never touches the driver: the per-group
    * sketches are struct columns whose key-sets `explode` into a
    * ≤ (groups × capacity)-row DataFrame, broadcast as a LEFT SEMI
    * join filter. At millions of groups a driver `collect()` +
    * `isin(...)` would hold every candidate in driver memory and
    * embed them all in one giant `In` expression tree; a broadcast
    * semi-join keeps both the data and the plan O(1) in group count. */
  def exactTopKPerGroup(items: DataFrame, groupCol: String, itemCol: String,
                        k: Int, capacity: Int = 4096): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val mg = org.apache.spark.sql.functions.udaf(
      new MisraGries(capacity), org.apache.spark.sql.Encoders.STRING)
    val cands = items
      .select(col(groupCol), col(itemCol).cast("string").as("it"))
      .na.drop()
      .groupBy(col(groupCol)).agg(mg(col("it")).as("sk"))
      .select(explode(col("sk._1")).as("cand_item"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(itemCol))
    items
      .join(broadcast(cands), col(itemCol).cast("string") === col("cand_item"),
        "left_semi")
      .groupBy(col(groupCol), col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** [[exactTopK]] plus the exactness certificate: throws unless the
    * result is PROVABLY the global top-k — i.e. the k-th candidate's
    * exact count strictly exceeds the sketch's error bound `err` (any
    * non-candidate's true count is ≤ err), or the sketch never
    * decremented (err == 0: the candidate set IS the full distinct
    * set). Raise `capacity` when it fires. */
  def exactTopKCertified(items: DataFrame, itemCol: String, k: Int,
                         capacity: Int = 4096): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val (cands, _, err) = candidates(items, itemCol, capacity)
    val top = exactCounts(items, itemCol, k, cands)
    if (err > 0) {
      val counts = top.select(col("cnt")).collect().map(_.getLong(0))
      // fewer than k candidates with a nonzero bound: unseen items
      // could fill the gap; a k-th count within the bound could be
      // displaced — either way the proof fails
      if (counts.length < k || counts.last <= err)
        throw new IllegalStateException(
          s"HeavyHitters: cannot certify top-$k (candidates=" +
            s"${counts.length}, kth=${counts.lastOption.getOrElse(0L)}, " +
            s"err=$err) — raise capacity")
    }
    top
  }
}

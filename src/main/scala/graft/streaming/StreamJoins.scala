package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the schema-generic form
  * of [[MouseStream.correlate]] (fixed mouse schema, inner only):
  * arbitrary key/time columns, configurable range, and the outer
  * flavors, for correlating two live streams (impression→click,
  * order→fulfillment) without ever materializing either.
  *
  * Spark's engine keeps both sides' state and emits matches as rows
  * arrive; the TIME-BOUND in the join condition plus the watermarks
  * are what let it EVICT state — without them state grows forever at
  * 100 TB/day. The condition `right.ts ∈ [left.ts, left.ts + range]`
  * bounds retained left state to `watermark + range` and right state
  * to `watermark`, so executor memory is proportional to event RATE,
  * not stream length. Outer joins additionally emit the unmatched
  * side once the watermark passes its eviction bound (exactly-once
  * with checkpointing, same as every sink in MouseStream).
  */
object StreamJoins {

  /** Interval join: each `right` row matches `left` rows of the same
    * `keys` whose `leftTs` is within `[rightTs - rangeSec, rightTs]`
    * — i.e. the right event happened at most `rangeSec` seconds AFTER
    * the left event. Timestamp columns must be TimestampType.
    *
    * `joinType` may be "inner", "leftOuter", or "rightOuter" (outer
    * emission waits for the watermark, per engine semantics). Column
    * sets of the two sides must be disjoint apart from `keys`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, rangeSec: Long,
                   watermark: String = "30 seconds",
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin: at least one key column")
    require(rangeSec > 0, s"intervalJoin: rangeSec must be positive, got $rangeSec")
    require(Set("inner", "leftOuter", "rightOuter")(joinType),
      s"intervalJoin: joinType must be inner|leftOuter|rightOuter, got '$joinType'")
    val dupNonKey =
      left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet
    require(dupNonKey.isEmpty,
      s"intervalJoin: non-key column collision ${dupNonKey.mkString(", ")} — rename first")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val keyEq = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeBound =
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $rangeSec SECONDS")
    l.join(r, keyEq && timeBound, joinType)
  }
}

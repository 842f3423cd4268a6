package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Reference-parity pipeline (SURVEY.md §2-§3): the mouse-movement
  * analytics of dmtraverso/kinesis-demo re-expressed over the driver's
  * `events` table.
  *
  * Mapping of the reference's data model onto the test schema:
  *  - stream key `user_id`           → events.user_id (functions.js:212)
  *  - event time millis `Time`       → events.ts_us   (functions.js:255)
  *  - aggregate grain epoch-seconds  → `sec = ts_us div 1e6` (functions.js:49-52)
  *  - page position (X, Y)           → derived ints
  *      x = floor(value / 10), y = props.k   (both deterministic)
  *  - heartbeat sentinel {0,0}       → event_type = 'error'
  *      ("mouse stayed at previous position", functions.js:363-371)
  *
  * Every operator is a pure DataFrame → DataFrame function: Catalyst
  * sees the whole plan, so filter/projection pushdown into the parquet
  * scan and partial aggregation are automatic. At cluster scale the
  * only shuffles are the keyed aggregations themselves.
  */
object Movements {

  /** Sentinel classification (SURVEY P5, functions.js:365). */
  def isSentinel: Column = col("event_type") === "error"

  /** Canonical event view with derived position columns.
    * Sentinel rows get NULL position (they mean "no new position"). */
  def positioned(events: DataFrame): DataFrame =
    events
      .withColumn("x", when(!isSentinel, floor(col("value") / 10).cast("int")))
      .withColumn("y", when(!isSentinel,
        get_json_object(col("props"), "$.k").cast("int")))

  /** A1+A2 — the core server-side operator: per (user, second) event
    * count plus retained raw events (`movs`), sorted for determinism
    * (reference retention order = arrival order, functions.js:361-362). */
  def perSecond(events: DataFrame): DataFrame =
    positioned(events)
      .groupBy(col("user_id"), col("sec"))
      .agg(
        count(lit(1)).as("cnt"),
        sort_array(collect_list(struct(col("ts_us"), col("x"), col("y"))))
          .as("movs"))

  /** Incremental maintenance of the per-second aggregate table: merge
    * a batch of new events into an existing materialization — the
    * reference's DynamoDB UpdateItem semantics (PNG flow 4) as a
    * batch operator. Because the aggregation is distributive
    * (counts add, retained events union), the merged table is
    * EXACTLY perSecond(old ∪ new) — asserted as a property test.
    * At scale this is the backfill/compaction path: only the delta
    * shuffles, the existing table joins by its (user, sec) key. */
  def mergeIncrement(agg: DataFrame, newEvents: DataFrame): DataFrame = {
    val emptyMovs = array().cast(
      "array<struct<ts_us:bigint,x:int,y:int>>")
    fullOuterMerge(agg, perSecond(newEvents))(
      sort_array(concat(
        coalesce(col("a.movs"), emptyMovs),
        coalesce(col("d.movs"), emptyMovs))).as("movs"))
  }

  /** The shared merge core: full-outer key join of an existing
    * materialization with an aggregated delta; counts always add,
    * extra payload columns merge via `extra`. */
  private def fullOuterMerge(agg: DataFrame, delta: DataFrame)
                            (extra: Column*): DataFrame =
    agg.as("a")
      .join(delta.as("d"), Seq("user_id", "sec"), "full_outer")
      .select(col("user_id") +: col("sec") +:
        (coalesce(col("a.cnt"), lit(0L)) + coalesce(col("d.cnt"), lit(0L)))
          .as("cnt") +: extra: _*)

  /** Count-only incremental merge — [[mergeIncrement]] without the
    * retention payload, shaped for the oracle gate: merging any
    * disjoint split of the stream must reproduce the full recompute
    * exactly (counts are distributive). */
  def mergeCountsIncrement(agg: DataFrame, newEvents: DataFrame): DataFrame =
    fullOuterMerge(agg, perSecondCounts(newEvents))()

  /** A1 without retention — the oracle-facing per-second count. */
  def perSecondCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("sec")).agg(count(lit(1)).as("cnt"))

  /** A3 + P1/P2 — incremental chart poll: total events per user strictly
    * after a continuation token (functions.js:151-187). */
  def chartSum(events: DataFrame, fromSec: Long): DataFrame =
    events
      .filter(col("sec") > fromSec)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("total_events"))

  /** P3/F4 — chart projection: per-second counts with display label
    * (functions.js:276-280) for one user. */
  def chart(events: DataFrame, userId: Long): DataFrame =
    perSecondCounts(events.filter(col("user_id") === userId))
      .select(
        col("sec"),
        date_format(timestamp_seconds(col("sec")), "HH:mm:ss").as("label"),
        col("cnt"))

  /** O1-O3 — keyed range scan, newest first, top-k
    * (reverse=true&limit=k, functions.js:351). Plans as
    * TakeOrderedAndProject — no global sort at scale. */
  def topkRecent(events: DataFrame, userId: Long, k: Int): DataFrame =
    perSecondCounts(events.filter(col("user_id") === userId))
      .select(col("sec"), col("cnt"))
      .orderBy(col("sec").desc)
      .limit(k)

  /** W1 — LOCF: carry the last real position over sentinel rows, in
    * per-user event-time order (functions.js:363-390). Leading
    * sentinels keep NULL (the `if (id)` drop-guard, functions.js:381). */
  def locf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positioned(events)
      .withColumn("cx", last(col("x"), ignoreNulls = true).over(w))
      .withColumn("cy", last(col("y"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("cx"), col("cy"))
  }

  /** Linear interpolation of sentinel positions — the numeric upgrade
    * of [[locf]] (W1): a sentinel row takes the time-weighted blend of
    * the nearest real positions before and after it instead of a flat
    * carry. Leading sentinels backfill from the next real position,
    * trailing ones carry the previous (so the operator degrades to
    * LOCF/NOCB at the edges); users with no real position stay NULL.
    *
    * Exactness: ts_us values (≈1.7e15) are below 2^53, so the long→
    * double casts and subtractions are lossless, and the blend is
    * three correctly-rounded IEEE ops (divide, multiply, add) —
    * bit-identical in any IEEE-754 engine, no rounding fuzz needed
    * for the oracle. Two window passes over one per-user sort; the
    * sort is shared (same partitioning + ordering), so the plan has
    * ONE exchange and one sort like [[locf]]. */
  def interpolated(events: DataFrame): DataFrame = {
    val past = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def blend(prev: Column, next: Column, pt: Column, nt: Column): Column = {
      val ratio = (col("ts_us") - pt).cast("double") / (nt - pt).cast("double")
      when(pt.isNotNull && nt.isNotNull && nt =!= pt,
        prev.cast("double") + (next - prev).cast("double") * ratio)
        .when(pt.isNotNull, prev.cast("double"))   // trailing, or exact hit
        .otherwise(next.cast("double"))            // leading backfill (or NULL)
    }
    // per-axis time anchors: y can be null on a row where x is not
    // (absent JSON key), so each axis interpolates between ITS own
    // nearest observations
    positioned(events)
      .withColumn("px", last(col("x"), ignoreNulls = true).over(past))
      .withColumn("ptx",
        last(when(col("x").isNotNull, col("ts_us")), ignoreNulls = true).over(past))
      .withColumn("py", last(col("y"), ignoreNulls = true).over(past))
      .withColumn("pty",
        last(when(col("y").isNotNull, col("ts_us")), ignoreNulls = true).over(past))
      .withColumn("nx", first(col("x"), ignoreNulls = true).over(future))
      .withColumn("ntx",
        first(when(col("x").isNotNull, col("ts_us")), ignoreNulls = true).over(future))
      .withColumn("ny", first(col("y"), ignoreNulls = true).over(future))
      .withColumn("nty",
        first(when(col("y").isNotNull, col("ts_us")), ignoreNulls = true).over(future))
      .select(col("user_id"), col("event_id"),
        blend(col("px"), col("nx"), col("ptx"), col("ntx")).as("ix"),
        blend(col("py"), col("ny"), col("pty"), col("nty")).as("iy"))
  }

  /** §3.3 — the full heatmap pipeline for one user: most recent `k`
    * seconds → flatten → LOCF → per-position counts (functions.js:333-418).
    *
    * Composition note: the recent-seconds limit runs first
    * (TakeOrderedAndProject on a single user's data), so the window
    * function and the (x,y) aggregation only ever see ~k seconds of
    * events regardless of table size.
    */
  def heatmap(events: DataFrame, userId: Long, k: Int = 10): DataFrame = {
    val user = events.filter(col("user_id") === userId)
    val recent = user.groupBy(col("sec")).agg(count(lit(1)).as("c"))
      .orderBy(col("sec").desc).limit(k).select(col("sec"))
    val inWindow = user.join(broadcast(recent), "sec")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positioned(inWindow)
      .withColumn("cx", last(col("x"), ignoreNulls = true).over(w))
      .withColumn("cy", last(col("y"), ignoreNulls = true).over(w))
      .filter(col("cx").isNotNull)
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("value"))
  }

  /** The heatmap pipeline generalized to EVERY user in one job: the
    * per-user "k most recent seconds" becomes a rank window instead of
    * a limit, then the LOCF + position count run per user exactly as
    * in [[heatmap]]. This is the materialize-all-dashboards shape: at
    * scale it is two keyed shuffles (rank, count) over data already
    * reduced to k seconds per user — no per-user driver loop. */
  def heatmapAll(events: DataFrame, k: Int = 10): DataFrame = {
    val bySecRank = Window.partitionBy(col("user_id"))
      .orderBy(col("sec").desc)
    val recent = events.groupBy(col("user_id"), col("sec"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(bySecRank))
      .filter(col("rn") <= k)
      .select(col("user_id"), col("sec"))
    val inWindow = events.join(recent, Seq("user_id", "sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positioned(inWindow)
      .withColumn("cx", last(col("x"), ignoreNulls = true).over(w))
      .withColumn("cy", last(col("y"), ignoreNulls = true).over(w))
      .filter(col("cx").isNotNull)
      .groupBy(col("user_id"), col("cx"), col("cy"))
      .agg(count(lit(1)).as("value"))
  }

  /** A5 — heatmap intensity ceiling: global max of per-position counts
    * (functions.js:357,388). */
  def heatmapMax(events: DataFrame, userId: Long, k: Int = 10): DataFrame =
    heatmap(events, userId, k).agg(max(col("value")).as("max_value"))

  /** A4+A5 fused: points and intensity ceiling in ONE typed pass via
    * [[graft.functions.HeatmapAggregator]] — the render payload the
    * reference consumes (functions.js:393-409) without a second job.
    * Returns a single [[graft.functions.HeatmapData]]. */
  def heatmapFused(events: DataFrame, userId: Long,
                   k: Int = 10): graft.functions.HeatmapData = {
    val spark = events.sparkSession
    import spark.implicits._
    val user = events.filter(col("user_id") === userId)
    val recent = user.groupBy(col("sec")).agg(count(lit(1)).as("c"))
      .orderBy(col("sec").desc).limit(k).select(col("sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positioned(user.join(broadcast(recent), "sec"))
      .withColumn("cx", last(col("x"), ignoreNulls = true).over(w))
      .withColumn("cy", last(col("y"), ignoreNulls = true).over(w))
      .filter(col("cx").isNotNull)
      .select(col("cx"), col("cy")).as[(Int, Int)]
      .select(graft.functions.HeatmapAggregator.toColumn.name("hm"))
      .collect()(0)
  }

  /** Bot-detection signals per user — the abuse-filtering pass a real
    * clickstream ingest runs before the data is trusted (rate limits,
    * scripted-mouse detection). Three engine-exact heuristics:
    *
    *  - **straightness**: fraction of consecutive positioned triples
    *    that are collinear — the cross product
    *    (x2−x1)(y3−y2) − (y2−y1)(x3−x2) is INTEGER arithmetic, so the
    *    collinearity bit is exact on any engine. Scripted movement is
    *    straight; human mouse traces wiggle.
    *  - **burst**: max events in any one second (rate-limit signal).
    *  - **cadence**: mean and dispersion of inter-event gaps, emitted
    *    INTEGER-EXACT so the readout is portable across engines:
    *    `mean_gap_floor_us` is the floor of gs/gn in BIGINT division,
    *    and `var_gap_num` is the variance numerator gn·gss − gs²
    *    (= gn²·variance) carried in DECIMAL — no doubles, no sqrt, no
    *    rounding ties. (Round 5 emitted `round(double, 4)` on
    *    ~10¹⁰-magnitude µs moments, where the 4th decimal sits below
    *    one ulp and engines tie-break differently — the suite's only
    *    red row.) Widths are sized from physics: gs is the user's
    *    wall-clock span in µs (< 10¹⁹), gss ≤ gs² (< 10²⁸ for spans
    *    up to ~3 centuries), gn < 10¹⁰ events/user, so gn·gss < 10³⁸
    *    fits DECIMAL(38,0) and Cauchy–Schwarz keeps the result ≥ 0.
    *
    * Plan: one user-partitioned window pass (leads/lags), one user
    * aggregate on the same partitioning, plus the (user, sec) burst
    * aggregate joined back user-keyed. Event volume crosses two keyed
    * exchanges. */
  def botSignals(events: DataFrame): DataFrame = {
    val p = positioned(events).filter(col("x").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val x2 = lead(col("x"), 1).over(w)
    val y2 = lead(col("y"), 1).over(w)
    val x3 = lead(col("x"), 2).over(w)
    val y3 = lead(col("y"), 2).over(w)
    val cross = (x2 - col("x")).cast("long") * (y3 - y2) -
      (y2 - col("y")).cast("long") * (x3 - x2)
    val gap = col("ts_us") - lag(col("ts_us"), 1).over(w)
    val staged = p.select(col("user_id"), col("sec"),
      when(x3.isNotNull, when(cross === 0L, 1L).otherwise(0L))
        .as("lin"),
      gap.as("gap"))
    val perUser = staged.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_moves"),
      sum(col("lin")).as("n_straight"),
      count(col("lin")).as("n_triples"),
      sum(col("gap").cast("decimal(38,0)")).as("_gs"),
      // square in DECIMAL: a week-long µs gap squared overflows long
      sum(col("gap").cast("decimal(19,0)") *
        col("gap").cast("decimal(19,0)")).as("_gss"),
      count(col("gap")).as("_gn"))
    val bursts = p.groupBy(col("user_id"), col("sec"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id")).agg(max(col("c")).as("max_per_sec"))
    val varNum = (col("_gn").cast("decimal(10,0)") *
      col("_gss").cast("decimal(28,0)") -
      col("_gs").cast("decimal(19,0)") * col("_gs").cast("decimal(19,0)"))
      .cast("decimal(38,0)")
    perUser.join(bursts, "user_id")
      .select(
        col("user_id"), col("n_moves"), col("max_per_sec"),
        round(when(col("n_triples") === 0L, 0.0)
          .otherwise(col("n_straight").cast("double") / col("n_triples")),
          8).as("straight8"),
        when(col("_gn") === 0L, 0L)
          .otherwise(expr("CAST(_gs AS BIGINT) div _gn"))
          .as("mean_gap_floor_us"),
        // shipped as a STRING: the exact numerator reaches ~6.5e24 on
        // real data — beyond float64's 2^53 — so any numeric readout
        // path (DuckDB returns DECIMAL(38,0) as double) corrupts it.
        // Repo rule (ARCHITECTURE §2): no numeric output column may
        // exceed 2^53; wider integers ship as DECIMAL<=18 or string.
        when(col("_gn") === 0L, lit(0).cast("decimal(38,0)"))
          .otherwise(varNum).cast("string").as("var_gap_num"))
  }

  /** P5/A6 — sentinel vs movement counts per user (functions.js:365;
    * running total events_tracked, functions.js:19,257). */
  def sentinelStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(isSentinel, 1L).otherwise(0L)).as("sentinels"),
        sum(when(!isSentinel, 1L).otherwise(0L)).as("moves"))

  /** S3 — the reference's zero-fill heartbeat (functions.js:196-204)
    * as a declarative gap-fill: for one user, emit every minute between
    * the first and last observed minute of each hour, zero-counted when
    * empty. sequence+explode generates the missing grain rows; the
    * left join fills observed counts — no driver-side loops, no state. */
  def gapFillMinutes(events: DataFrame, userId: Long): DataFrame = {
    val m = events.filter(col("user_id") === userId)
      .groupBy(
        expr("sec div 3600 * 3600").as("hour_start"),
        expr("(sec % 3600) div 60").as("minute"))
      .agg(count(lit(1)).as("cnt"))
    val bounds = m.groupBy(col("hour_start"))
      .agg(min(col("minute")).as("mn"), max(col("minute")).as("mx"))
    bounds
      .select(col("hour_start"),
        explode(sequence(col("mn"), col("mx"))).as("minute"))
      .join(m, Seq("hour_start", "minute"), "left_outer")
      .select(col("hour_start"), col("minute"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Native session windows in batch: Spark's `session_window` merges
    * events whose gap is strictly under `gapSec`. Mirrors
    * [[sessions]] but through the built-in window machinery (and the
    * exact formulation the streaming `MouseStream.sessionize` uses). */
  def sessionWindows(events: DataFrame, gapSec: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_sec"),
        col("n_events"))

  /** Sessionization — gap-based session assignment (extension of the
    * reference's implicit per-poll batching to a real session op).
    * A new session starts when the gap to the previous event of the
    * same user exceeds `gapSec`. */
  def sessions(events: DataFrame, gapSec: Long): DataFrame =
    sessionBounds(events, gapSec)
      .select(col("user_id"), col("session_id"), col("n_events"),
        expr("(max_us - min_us) div 1000000").as("duration_sec"))

  /** The gap-based sessionization with its time BOUNDS kept — one row
    * per (user, session) with [min_us, max_us]: the input shape for
    * interval analytics over sessions (overlap joins, concurrency). */
  def sessionBounds(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val flagged = events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("min_us"),
        max(col("ts_us")).as("max_us"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators beyond the reference's single tumbling window:
  * as-of joins, sliding frames, coarser tumbling buckets.
  *
  * The as-of join is implemented union-style: tag both streams, sort
  * once per key, carry the last right-side row forward (LOCF). One
  * shuffle on the key, no range-join explosion — the classic
  * distributed as-of formulation, vs. a naive
  * `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax which
  * shuffles |L|·|matches| rows. This is the scale path at 100 TB.
  */
object TimeSeries {

  /** Sliding-window distinct counts WITHOUT re-scanning the raw data
    * per window — the payoff of a MERGEABLE sketch: one pass builds a
    * k-min array per time bucket ([[graft.functions.KmvMins]]), and a
    * sliding window is answered by composing bucket sketches with
    * array algebra (union → sort → first k = the union's k-min set,
    * exactly). At 100 TB the raw scan happens once; every window
    * after that is bucket-summary work (range/bucketSec rows). The
    * window frame is a RANGE frame on the bucket value, so gaps in
    * time don't stretch the window. Estimate rule = KmvSketch.finish,
    * reproduced by the oracle bit-for-bit. Buckets with no events are
    * absent from the output. `events` must carry a `sec` column
    * (epoch seconds — the graft events convention, see Tables). */
  def slidingDistinct(events: DataFrame, keyCol: String,
                      bucketSec: Long = 300, windowBuckets: Int = 6,
                      k: Int = 64): DataFrame = {
    require(bucketSec > 0 && windowBuckets >= 1 && k >= 2,
      "slidingDistinct: bucketSec > 0, windowBuckets >= 1, k >= 2")
    val mins = udaf(new graft.functions.KmvMins(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val byBucket = events
      .withColumn("bucket", expr(s"sec div ${bucketSec}L"))
      .groupBy("bucket")
      .agg(mins(graft.functions.Portable.hash52(col(keyCol))).as("mins"))
    val w = Window.orderBy("bucket")
      .rangeBetween(-(windowBuckets - 1L), 0L)
    byBucket
      .withColumn("win_mins", slice(array_sort(array_distinct(
        flatten(collect_list(col("mins")).over(w)))), 1, k))
      .select(col("bucket"),
        round(when(size(col("win_mins")) < k,
          size(col("win_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble * 4503599627370496.0) /
            element_at(col("win_mins"), k)), 2).as("distinct_est"))
  }

  /** Sweep-line concurrency over half-open intervals [loCol, hiCol):
    * how many intervals are simultaneously open, as the MAX level per
    * time bucket (`bucketUs` micros). The classic use: concurrent
    * sessions / connections / jobs per hour.
    *
    * Distributed sweep without a global sort: +1/−1 edge events
    * cumsum WITHIN their bucket (window partitioned by bucket), then
    * bucket-level totals prefix-sum into per-bucket offsets — that
    * second window is global but runs over the bucket SUMMARY
    * (range/bucketUs rows, e.g. 720 for a month of hours), never the
    * events. level = offset + local cumsum; ends sort before starts
    * at the same instant (delta −1 < +1), matching half-open
    * semantics. Buckets with no edge events are absent (their level
    * is the previous bucket's closing level; emit-on-change form).
    * Per-bucket max is tie-order-independent: rows tied on (t, delta)
    * are identical, so their cumsum prefix SET is fixed under any
    * ordering — deterministic, engine-exact.
    *
    * Inputs must satisfy lo ≤ hi; an empty interval (lo == hi) is
    * never counted (its end edge sorts before its start edge). */
  def sweepConcurrency(intervals: DataFrame, loCol: String, hiCol: String,
                       bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "sweepConcurrency: bucketUs must be positive")
    val edges = intervals.select(col(loCol).as("t"), lit(1L).as("delta"))
      .unionByName(intervals.select(col(hiCol).as("t"), lit(-1L).as("delta")))
      .withColumn("bucket", expr(s"t div ${bucketUs}L"))
    val wLocal = Window.partitionBy("bucket").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = edges.withColumn("lc", sum("delta").over(wLocal))
    val perBucket = local.groupBy("bucket")
      .agg(sum("delta").as("tot"), max("lc").as("maxlc"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("off", coalesce(sum("tot").over(wOff), lit(0L)))
      // max over the bucket's TIME span = max(carry-in level, levels
      // after each edge) — when the bucket's first edges are ends,
      // the carry-in (offset + 0) is the max, hence the clamp at 0
      .select(col("bucket"),
        (col("off") + greatest(col("maxlc"), lit(0L))).as("max_concurrent"))
  }

  /** As-of join inside the events table: for every purchase event, the
    * most recent strictly-earlier click event of the same user.
    * Returns (user_id, purchase event_id, ns, matched click event_id,
    * ns, gap seconds — null when no prior click). */
  def asofPurchaseClick(events: DataFrame): DataFrame = {
    val tagged = events
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("value"))
      .filter(col("event_type").isin("purchase", "click"))
    // sort order puts a click before a purchase at identical ts_us
    // (strictly-earlier semantics ⇒ a same-instant click must be
    // visible to the purchase; event order key breaks remaining ties)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("event_type") === "click", col("ts_us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      // click_us stays internal; the gap is the portable output
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("click_id"),
        expr("(ts_us - click_us) div 1000000").as("gap_sec"))
  }

  /** The same purchase←click correlation through the NATIVE as-of
    * operator ([[graft.plans.AsOfJoin]]): purchases as-of join the
    * per-(user, instant) click stream (pre-aggregated to max event_id
    * so tie choice is well-defined), inclusive semantics. One hash
    * exchange + one sort per side and a streaming merge — no |L|+|R|
    * union window pass. */
  def asofNative(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us").as("click_us"), col("click_id"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        on = Seq("user_id"), leftTimeCol = "ts_us", rightTimeCol = "click_us")
      .toDF("user_id", "event_id", "ts_us", "r_user_id", "click_us", "click_id")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("click_id"),
        expr("(ts_us - click_us) div 1000000").as("gap_sec"))
  }

  /** [[asofNative]] with the native operator's TOLERANCE: a purchase
    * only matches a click at most `tolSec` back — a stale click is no
    * attribution signal. The most-recent-overall candidate is the
    * most-recent-within-tolerance whenever one exists, so the oracle
    * is the plain ASOF join with matches beyond tolerance nulled. */
  def asofNativeTolerance(events: DataFrame, tolSec: Long = 60L): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us").as("click_us"), col("click_id"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        on = Seq("user_id"), leftTimeCol = "ts_us", rightTimeCol = "click_us",
        toleranceUs = Some(tolSec * 1000000L))
      .toDF("user_id", "event_id", "ts_us", "r_user_id", "click_us", "click_id")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("click_id"),
        expr("(ts_us - click_us) div 1000000").as("gap_sec"))
  }

  /** [[asofNative]] in STRICT mode: a same-instant click is NOT
    * visible to the purchase (l.ts > r.ts). With the inclusive,
    * tolerance and forward queries this puts every mode of the
    * native operator behind a value-exact oracle. */
  def asofNativeStrict(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us").as("click_us"), col("click_id"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        on = Seq("user_id"), leftTimeCol = "ts_us", rightTimeCol = "click_us",
        strict = true)
      .toDF("user_id", "event_id", "ts_us", "r_user_id", "click_us", "click_id")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("click_id"),
        expr("(ts_us - click_us) div 1000000").as("gap_sec"))
  }

  /** FORWARD as-of through the native operator: for every click, the
    * next purchase of the same user at or after it — the
    * click-to-conversion lead time. Mirrors DuckDB's forward ASOF
    * (`l.ts <= r.ts`), so the oracle is symmetric with
    * [[asofNative]]'s backward form. */
  def asofNextPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("ts_us").as("purchase_us"),
        col("purchase_id"))
    graft.plans.AsOfJoin.asofForward(clicks, purchases,
        on = Seq("user_id"), leftTimeCol = "ts_us",
        rightTimeCol = "purchase_us")
      .toDF("user_id", "event_id", "ts_us", "r_user_id", "purchase_us",
        "purchase_id")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("purchase_id"),
        expr("(purchase_us - ts_us) div 1000000").as("lead_sec"))
  }

  /** Sliding-frame average: mean of the current and two previous event
    * values per user (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW).
    * Decimal accumulation so the result is engine-exact. */
  def slidingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events
      .withColumn("avg3",
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w), 4))
      .select(col("user_id"), col("event_id"), col("avg3"))
  }

  /** M4 chart downsampling (Jugel, Markl et al., "M4: A
    * visualization-oriented time series data aggregation", VLDB
    * 2014): per pixel-column time bucket, keep exactly the four
    * values a line chart needs — first, last, min, max — which is
    * PROVABLY sufficient to render the same pixels as the raw
    * series. The display edge for the reference's chart at scale:
    * 100 TB of points reduce to 4·width rows before they ever leave
    * the cluster.
    *
    * Buckets split [minSec, maxSec] proportionally (integer math,
    * engine-exact); the outputs are PICKS of stored doubles — no
    * arithmetic, so the oracle hash-matches bit-for-bit. First/last
    * tie-break on (ts_us, event_id), the table's total order,
    * selected by struct-min/max — NOT a bucket-partitioned window:
    * with only ~width buckets a window sort would concentrate 100 TB
    * into `buckets` sort partitions, while min/max over
    * (ts_us, event_id, value) structs stays a map-side-combinable
    * aggregate at any scale (the DuckDB oracle states the same pick
    * as a row_number window, equivalent because (ts_us, event_id) is
    * unique). */
  def m4Downsample(events: DataFrame, buckets: Int = 100): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val bounds = events.agg(
      min(col("sec")).as("lo"), max(col("sec")).as("hi"))
    val tagged = struct(col("ts_us"), col("event_id"), col("value"))
    events
      .crossJoin(broadcast(bounds))
      // integer div end-to-end: a double round-trip would be exact at
      // chart scales but `div` stays exact at ANY sec range
      .withColumn("bucket",
        expr(s"((sec - lo) * ${buckets.toLong}L) div (hi - lo + 1L)"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        min(tagged).getField("value").as("v_first"),
        max(tagged).getField("value").as("v_last"))
  }

  /** Time-weighted average (TWAP) per user: each sample's value is
    * weighted by how long it was "current" (until the next sample);
    * the last sample of a series carries no duration and drops out.
    * The sensor/finance staple that plain avg() gets wrong under
    * irregular sampling. One window pass for the lead, then a
    * map-side-combinable agg; weights are decimal-exact products so
    * the oracle reproduces the ratio bit-for-bit at round scale. */
  def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      // DECIMAL(30,4) operands: micro-second gaps can reach ~5e14, so
      // an 18-digit product representation overflows in engines that
      // multiply at the operand width (the true product still has only
      // 4 fractional digits, so widening stays exact)
      .agg(
        round(sum(col("value").cast("decimal(30,4)") *
            col("dt").cast("decimal(30,4)")).cast("double") /
          sum(col("dt")).cast("double"), 6).as("twap"),
        count(lit(1)).as("n_weighted"))
  }

  /** VALUE-based (RANGE) window frame: per event, the count and exact
    * sum of the same user's events in the trailing `secs`-second
    * band. RANGE differs from ROWS exactly when the order key has
    * ties — every row with the same `sec` joins the frame regardless
    * of physical order, so the result is deterministic where a ROWS
    * frame over a tied sort is not (the remaining frame type the
    * window surface needed). */
  def trailingRangeSums(events: DataFrame, secs: Long = 10L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"))
      .rangeBetween(-secs, Window.currentRow)
    events.select(col("user_id"), col("event_id"), col("sec"),
      count(lit(1)).over(w).as("n_win"),
      round(sum(col("value").cast("decimal(18,4)")).over(w)
        .cast("double"), 2).as("sum_win"))
  }

  /** Calendar-month revenue rollup: date_trunc to month boundaries
    * (calendar grains, unlike the fixed-width second/minute buckets). */
  def monthlyRevenue(orders: DataFrame): DataFrame =
    orders
      .groupBy(unix_millis(date_trunc("month", col("o_orderdate"))
        .cast("timestamp")).as("month_start_ms"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"))

  /** Coarser tumbling buckets (5-minute) over event time — the batch
    * equivalent of `window($"ts", "5 minutes")`, keyed arithmetic on
    * the second grain so the oracle can mirror it exactly. */
  def fiveMinuteBuckets(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), expr("sec div 300 * 300").as("bucket_start"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
          .as("sum_value"))

  /** Frozen EMA kernel: `w_i = floor(10⁶ · α(1−α)^i)` for α = 1/4 and
    * lags i = 0..15 — exact dyadic rationals (denominators are powers
    * of 4) floored ONCE to ppm constants, so no engine ever computes
    * a power at query time (the `qc_benford` frozen-constant trick
    * applied to smoothing weights). */
  private val EmaWeightsPpm: Seq[Long] = Seq(
    250000L, 187500L, 140625L, 105468L, 79101L, 59326L, 44494L,
    33370L, 25028L, 18771L, 14078L, 10558L, 7919L, 5939L, 4454L,
    3340L)

  /** Truncated exponential smoothing over the per-priority daily
    * revenue series — the forecasting-baseline smoother the ts family
    * lacked next to its fixed-width sliding means: recent days
    * dominate with geometrically decaying memory (α = 1/4), but the
    * tail is TRUNCATED at 16 lags so the smoothed value is a pure
    * function of a bounded row frame (the recursive EMA is a
    * prefix-product over the whole history — unverifiable exactly and
    * unmergeable; the 16-lag truncation leaves < 1% of the mass and
    * makes the operator a plain window).
    *
    * `ema_cents = floor(Σᵢ wᵢ·xᵢ / Σᵢ wᵢ)` over the lags that EXIST
    * (the leading edge of each series renormalizes over the available
    * prefix — the standard adjusted/bias-corrected EMA form), with
    * revenue in integer cents and the frozen [[EmaWeightsPpm]]
    * weights: all-long arithmetic, worst case ≈ 16·10⁶·maxDayCents
    * < 2⁵³ for day revenues under ~$5.6 B. Smoothing is over
    * SUCCESSIVE OBSERVED days (row lags, not calendar lags): an
    * absent day contributes no observation rather than a zero.
    *
    * Scale: one group-by to the (series, day) grain, then one
    * per-series window whose state is 16 longs — series distribute
    * across executors, nothing global. */
  def emaDaily(orders: DataFrame): DataFrame = {
    val daily = orders.groupBy(col("o_orderpriority"),
        unix_millis(date_trunc("day", col("o_orderdate"))
          .cast("timestamp")).as("day_ms"))
      .agg(sum((col("o_totalprice").cast("decimal(9,2)") * lit(100))
        .cast("long")).as("revenue_cents"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day_ms"))
    val lags = EmaWeightsPpm.indices.map(i =>
      lag(col("revenue_cents"), i).over(w).as(s"x$i"))
    val num = EmaWeightsPpm.zipWithIndex
      .map { case (wi, i) => coalesce(col(s"x$i") * lit(wi), lit(0L)) }
      .reduce(_ + _)
    val den = EmaWeightsPpm.zipWithIndex
      .map { case (wi, i) =>
        when(col(s"x$i").isNotNull, lit(wi)).otherwise(lit(0L)) }
      .reduce(_ + _)
    daily.select(
        Seq(col("o_orderpriority"), col("day_ms"),
          col("revenue_cents")) ++ lags: _*)
      .select(col("o_orderpriority"), col("day_ms"), col("revenue_cents"),
        num.as("num"), den.as("den"))
      .select(col("o_orderpriority"), col("day_ms"), col("revenue_cents"),
        expr("num div den").as("ema_cents"))
  }

  /** Two-arm A/B conversion readout: users split by id parity (the
    * deterministic stand-in for an assignment column), conversion =
    * any `convType` event. One row: per-arm counts/rates, the rate
    * difference, its standard error and z-score — sqrt is IEEE-exact
    * and everything else is rational, so even the z-score
    * hash-matches across engines (the same libm discipline as the
    * drift statistic).
    *
    * Plan: per-user collapse (one shuffle) → ONE global conditional
    * aggregate (1-row result). Nothing here grows with event count
    * past the first agg. */
  def abConversion(events: DataFrame,
                   convType: String = "purchase"): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val n = (a: Int) => sum(when(col("arm") === a, 1L).otherwise(0L))
    val c = (a: Int) => sum(when(col("arm") === a, col("conv"))
      .otherwise(0L))
    val agg = perUser.agg(
      n(0).as("users_a"), c(0).as("conv_a"),
      n(1).as("users_b"), c(1).as("conv_b"))
    val ra = col("conv_a").cast("double") / col("users_a")
    val rb = col("conv_b").cast("double") / col("users_b")
    val se = sqrt(
      ra * (lit(1.0) - ra) / col("users_a") +
        rb * (lit(1.0) - rb) / col("users_b"))
    agg.select(
      col("users_a"), col("conv_a"), round(ra, 8).as("rate_a8"),
      col("users_b"), col("conv_b"), round(rb, 8).as("rate_b8"),
      round(ra - rb, 8).as("diff8"),
      round(se, 8).as("se8"),
      round(when(se === 0.0, 0.0).otherwise((ra - rb) / se), 8)
        .as("z8"))
  }

  /** Common opening paths: each user's first `k` events (by time,
    * event_id tiebreak) joined into a path string, counted across
    * users. Top paths by support. The per-user sequence rides one
    * user-partitioned window; the path table is users-sized, and the
    * final count is path-keyed — event volume is touched once. */
  def topPaths(events: DataFrame, k: Int = 3, top: Int = 20): DataFrame = {
    require(k >= 1 && top >= 1, "k and top must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val paths = events
      .select(col("user_id"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type")), "->").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(top)
  }

  /** Cohort retention: users grouped by their FIRST active period
    * (day grain), then for each later period the fraction of the
    * cohort still active — the other half of the product-analytics
    * pair with [[conversionFunnel]].
    *
    * Plan shape: ONE user-keyed aggregate collects each user's
    * distinct period set (collect_set dedupes map-side; the set is
    * bounded by the calendar, not the event count), cohort =
    * `array_min` of the set, offsets explode from it — so event
    * volume crosses exactly one exchange. The matrix is one
    * (cohort, offset) count and cohort size a window max over the
    * (tiny) matrix itself. Three keyed exchanges total, each
    * narrower than the last. */
  def cohortRetention(events: DataFrame,
                      periodSec: Long = 86400L): DataFrame = {
    require(periodSec > 0, "periodSec must be positive")
    val perUser = events
      .select(col("user_id"), expr(s"sec div $periodSec").as("period"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("period")).as("ps"))
      .select(col("user_id"), array_min(col("ps")).as("cohort"),
        explode(col("ps")).as("period"))
    val matrix = perUser
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val wc = Window.partitionBy(col("cohort"))
    matrix
      .withColumn("c0",
        max(when(col("offset") === 0L, col("n_users"))).over(wc))
      .select(col("cohort"), col("offset"), col("n_users"),
        round(col("n_users").cast("double") / col("c0"), 8)
          .as("retention8"))
  }

  /** Ordered conversion funnel: per user, step i is reached at the
    * EARLIEST event of `steps(i)`'s type that is strictly after the
    * step i−1 time (first-touch semantics — the standard product
    * funnel). Output: one row per step with users reached and the
    * conversion rate off the total user base.
    *
    * Plan shape: each step is a conditional `min` window over the SAME
    * user partition — Catalyst chains the Window ops behind ONE
    * exchange+sort, so an N-step funnel costs one shuffle of the
    * events, not N self-joins (the naive formulation) and never a
    * sequence explode. The final rollup aggregates per-user step
    * times — one row per user — then unpivots step counts from a
    * single result row, Expectations-style. */
  def conversionFunnel(events: DataFrame,
                       steps: Seq[String] = Seq("view", "click", "purchase"))
      : DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(col("user_id"))
    val stepped = steps.zipWithIndex.foldLeft(
      events.select(col("user_id"), col("event_type"), col("ts_us"))) {
      case (df, (step, i)) =>
        val reachable = if (i == 0) lit(true)
                        else col("ts_us") > col(s"_t${i - 1}")
        df.withColumn(s"_t$i",
          min(when(col("event_type") === step && reachable, col("ts_us")))
            .over(w))
    }
    val stepMins = steps.indices.map(i => min(col(s"_t$i")).as(s"_t$i"))
    val perUser = stepped.groupBy(col("user_id"))
      .agg(stepMins.head, stepMins.tail: _*)
    val countAggs = count(lit(1)).as("_users") +:
      steps.indices.map(i => count(col(s"_t$i")).as(s"_n$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    val pairs = steps.zipWithIndex.map { case (s, i) =>
      s"'${i + 1}:${s.replace("'", "''")}', _n$i"
    }
    counts
      .select(col("_users"),
        expr(s"stack(${pairs.length}, ${pairs.mkString(", ")})")
          .as(Seq("step", "users")))
      .select(col("step"), col("users"),
        round(col("users").cast("double") / col("_users"), 8)
          .as("conv8"))
  }

  /** Rolling-baseline rate-anomaly flags over bucketed event counts
    * (default hourly), keyed by event_type: a bucket is anomalous when
    * its count sits more than `tau` baseline standard deviations from
    * the mean of the PRECEDING `windowBuckets` buckets (a trailing frame — the bucket
    * under test never pollutes its own baseline). The z-test runs
    * entirely in integer arithmetic: with S = Σnᵢ and SS = Σnᵢ² over
    * the w trailing buckets, |n − S/w| > τ·σ  ⇔  (w·n − S)² >
    * τ²·(w·SS − S²) — no sqrt, no division, engine-exact on both
    * sides of the oracle. Buckets with fewer than `minPrior` trailing
    * observations are never flagged (cold start).
    *
    * Scale shape: the bucket table is one map-side-combinable groupBy,
    * and its cardinality is bounded by types × elapsed minutes — time-
    * bounded, not data-bounded, so the windowed pass stays small at
    * any input scale and parallelizes across event_type partitions.
    * Squares accumulate in DECIMAL(38,0) (HUGEINT on the oracle side)
    * so the identity holds far past long overflow. */
  def rateAnomalies(events: DataFrame, windowBuckets: Int = 10,
                    minPrior: Int = 5, tau: Int = 3,
                    bucketSec: Long = 3600L): DataFrame =
    scoreBuckets(
      events.groupBy(col("event_type"),
          expr(s"sec div $bucketSec * $bucketSec").as("bucket_start"))
        .agg(count(lit(1)).as("n")),
      windowBuckets, minPrior, tau, bucketSec)

  /** Lag-1 Pearson autocorrelation of the hourly count series per
    * event_type — the one-number answer to "is this series bursty or
    * memoryless?" (and the companion statistic to
    * [[seasonalDecompose]]: residuals should autocorrelate near 0).
    * Pairs are TRUE lag-1 — only buckets exactly one step apart pair
    * up, a gap breaks the chain. All five sufficient statistics
    * accumulate as integers (DECIMAL(38,0)); r's numerator
    * m·Sxy − Sx·Sy and the two variance terms are integer-exact, so
    * the only floating-point ops are the final sqrt and divide —
    * both correctly rounded in IEEE, hence engine-identical.
    * Zero-variance series report null. */
  def lag1Autocorr(events: DataFrame,
                   bucketSec: Long = 3600L): DataFrame = {
    val d38 = "decimal(38,0)"
    val buckets = events
      .groupBy(col("event_type"),
        expr(s"sec div $bucketSec * $bucketSec").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("bucket_start"))
    val pairs = buckets
      .withColumn("prev_b", lag(col("bucket_start"), 1).over(wOrd))
      .withColumn("x", lag(col("n"), 1).over(wOrd))
      .filter(col("prev_b") === col("bucket_start") - bucketSec)
      .select(col("event_type"), col("x"), col("n").as("y"))
    val agg = pairs.groupBy(col("event_type")).agg(
      count(lit(1)).cast(d38).as("m"),
      sum(col("x")).cast(d38).as("sx"),
      sum(col("y")).cast(d38).as("sy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"),
      sum((col("y") * col("y")).cast(d38)).as("syy"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"))
    val num = col("m") * col("sxy") - col("sx") * col("sy")
    val vx = col("m") * col("sxx") - col("sx") * col("sx")
    val vy = col("m") * col("syy") - col("sy") * col("sy")
    agg.select(col("event_type"), col("m").cast("long").as("n_pairs"),
      when(vx > 0 && vy > 0,
        round(num.cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 4)).as("r4"))
  }

  /** Per-type data FRESHNESS against the dataset's own frontier: how
    * far each event_type's newest record trails the newest record
    * overall — the lag a pipeline monitor alerts on, computed without
    * wall-clock time so the answer is a pure function of the data. */
  def freshness(events: DataFrame): DataFrame = {
    val frontier = events.agg(max(col("sec")).as("frontier_sec"))
    events.groupBy(col("event_type"))
      .agg(min(col("sec")).as("first_sec"), max(col("sec")).as("last_sec"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(frontier))
      .select(col("event_type"), col("first_sec"), col("last_sec"),
        col("n_events"),
        (col("frontier_sec") - col("last_sec")).as("stale_sec"))
  }

  /** Seasonal-naive decomposition of the hourly event rate: each
    * (event_type, hour bucket) count splits into the type's
    * HOUR-OF-DAY baseline (the mean count over every bucket sharing
    * the same hour slot — the classic seasonal profile) and the
    * residual against it. The residual series is what a forecaster
    * or anomaly gate should consume once the daily cycle is known —
    * [[rateAnomalies]] on raw counts flags rush hours; on residuals
    * it flags genuine deviations FROM the cycle.
    *
    * Determinism: the baseline is rounded to 4 decimals first and the
    * residual is computed against the ROUNDED baseline, so both
    * engines subtract identical doubles. Plan shape: bucket groupBy →
    * profile groupBy (24 × types rows) → broadcast join back; both
    * aggregations map-side combinable, nothing data-bounded is ever
    * shuffled twice. */
  def seasonalDecompose(events: DataFrame,
                        bucketSec: Long = 3600L): DataFrame = {
    val buckets = events
      .groupBy(col("event_type"),
        expr(s"sec div $bucketSec * $bucketSec").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hod", expr(s"bucket_start div $bucketSec % 24"))
    val profile = buckets
      .groupBy(col("event_type").as("_t"), col("hod").as("_h"))
      .agg(round(sum(col("n")).cast("double") / count(lit(1)), 4)
        .as("expected4"))
    buckets
      .join(broadcast(profile),
        col("event_type") === col("_t") && col("hod") === col("_h"))
      .select(col("event_type"), col("bucket_start"), col("hod"),
        col("n"), col("expected4"),
        round(col("n") - col("expected4"), 4).as("resid4"))
  }

  /** [[rateAnomalies]] over the DESEASONALIZED series: decompose the
    * hourly rate against its hour-of-day baseline, scale the rounded
    * residual ×10⁴ into an exact integer (resid4 has 4 decimals, so
    * the scaling is lossless), and run the same integer z-test. Raw
    * counts flag every rush hour; residual scoring flags departures
    * FROM the cycle — the composition is two operators end to end
    * with no new math and no precision loss anywhere. */
  def rateAnomaliesDeseasonalized(events: DataFrame,
                                  windowBuckets: Int = 10,
                                  minPrior: Int = 5, tau: Int = 3,
                                  bucketSec: Long = 3600L): DataFrame =
    scoreBuckets(
      seasonalDecompose(events, bucketSec)
        .select(col("event_type"), col("bucket_start"),
          round(col("resid4") * 10000).cast("long").as("n")),
      windowBuckets, minPrior, tau, bucketSec)

  /** Single changepoint per event_type by the CUSUM maximizer — the
    * location step of binary segmentation (Page 1954; Scott & Knott
    * 1974): the bucket k where the cumulative deviation from the
    * global mean peaks. The statistic is kept EXACT by clearing the
    * mean's denominator: |prefix_k − k·(S/N)| maximizes where
    * |N·prefix_k − k·S| does, and the latter is pure integer
    * arithmetic (DECIMAL(38,0) against overflow). Ties break on the
    * earliest bucket. One row per type: the changepoint bucket, the
    * scaled peak statistic, and the mean rate on each side of the
    * cut — the before/after summary a drift report needs.
    *
    * Scale shape: everything after the bucket groupBy runs on the
    * time-bounded summary; two windows (cumsum, rank) and the final
    * filter — per-type partitions, no global pass. */
  def changepoint(events: DataFrame,
                  bucketSec: Long = 3600L): DataFrame = {
    val d38 = "decimal(38,0)"
    val buckets = events
      .groupBy(col("event_type"),
        expr(s"sec div $bucketSec * $bucketSec").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("bucket_start"))
    val wAll = Window.partitionBy(col("event_type"))
    val scored = buckets
      .withColumn("k", row_number().over(wOrd))
      .withColumn("prefix", sum(col("n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nb", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("stat",
        abs(col("nb").cast(d38) * col("prefix") -
          col("k").cast(d38) * col("total")))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("stat").desc, col("bucket_start"))
    scored
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") === 1)
      .select(col("event_type"), col("bucket_start").as("cp_bucket"),
        col("stat").cast("long").as("stat"),
        col("nb").as("n_buckets"), col("total").as("total_n"),
        round(col("prefix").cast("double") / col("k"), 4).as("mean_before4"),
        when(col("nb") > col("k"),
          round((col("total") - col("prefix")).cast("double") /
            (col("nb") - col("k")), 4)).as("mean_after4"))
  }

  /** The scoring half of [[rateAnomalies]], split out so a STREAMING
    * pipeline can compose it: maintain (event_type, bucket_start, n)
    * counts incrementally (an update-mode windowed aggregation or a
    * foreachBatch upsert — additive counts merge trivially) and
    * re-score the summary table per micro-batch. The summary is
    * time-bounded, so re-scoring it whole is cheap at any input rate
    * and batch/stream results agree exactly — same gate, same
    * integer z-test, no drift between the two planes. */
  def scoreBuckets(buckets: DataFrame, windowBuckets: Int = 10,
                   minPrior: Int = 5, tau: Int = 3,
                   bucketSec: Long = 3600L): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_start"))
      .rangeBetween(-bucketSec * windowBuckets, -bucketSec)
    val scored = buckets
      .withColumn("base_cnt", count(lit(1)).over(w))
      .withColumn("base_sum", sum(col("n")).over(w))
      .withColumn("base_sumsq",
        sum((col("n") * col("n")).cast(d38)).over(w))
    val dev = (col("base_cnt") * col("n") - col("base_sum")).cast(d38)
    val varTimesW2 = col("base_cnt").cast(d38) * col("base_sumsq") -
      col("base_sum").cast(d38) * col("base_sum").cast(d38)
    scored.select(
      col("event_type"), col("bucket_start"), col("n"), col("base_cnt"),
      when(col("base_cnt") > 0,
        round(col("base_sum").cast("double") / col("base_cnt"), 4))
        .as("mean4"),
      when(col("base_cnt") >= minPrior &&
           dev * dev > lit(tau.toLong * tau).cast(d38) * varTimesW2,
        lit(1)).otherwise(lit(0)).as("is_anomaly"))
  }

  /** CEP first-match pattern: every occurrence of `first` followed by
    * the NEXT `second` within `windowUs`, with NO `anti` event between
    * them — the negation-within-window pattern
    * (view→purchase-with-no-error) that [[conversionFunnel]]'s
    * stage counts and [[topPaths]]' bigrams can't express. Returns
    * one row per match: (user_id, first_id, second_id, gap_us).
    * "Next" and "between" are over the total per-user order
    * (ts_us, event_id), so ties are deterministic.
    *
    * The MATCH_RECOGNIZE-style lowering is ONE window pass, not an
    * event self-join: ordered DESC per user, a running min over the
    * preceding frame carries each row's next-`second` (ts, id) and
    * next-`anti` position from the future side in O(n) per user —
    * the running frame accumulates, where an unbounded-FOLLOWING
    * frame would rescan the tail per row (O(n²) per partition). A
    * match is a `first` row whose next-`second` lands inside the
    * window with the next-`anti` strictly after it. One shuffle on
    * user_id, no join, no candidate blowup: per-user event volume is
    * the only term, which is what bounds it at corpus scale. */
  def cepMatch(events: DataFrame, first: String = "view",
               second: String = "purchase", anti: String = "error",
               windowUs: Long = 3600000000L): DataFrame = {
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"))
      .withColumn("nb", min(when(col("event_type") === second,
        struct(col("ts_us"), col("event_id")))).over(wDesc))
      .withColumn("nx", min(when(col("event_type") === anti,
        struct(col("ts_us"), col("event_id")))).over(wDesc))
      .filter(col("event_type") === first && col("nb").isNotNull &&
        col("nb.ts_us") <= col("ts_us") + lit(windowUs) &&
        (col("nx").isNull || col("nx") > col("nb")))
      .select(col("user_id"), col("event_id").as("first_id"),
        col("nb.event_id").as("second_id"),
        (col("nb.ts_us") - col("ts_us")).as("gap_us"))
  }

  /** Linear multi-touch attribution: each conversion splits ONE unit
    * of credit equally across the touch events in its lookback window
    * (round(1/n, 6), summed per channel in DECIMAL so the total is
    * order-independent); conversions with no preceding touch credit
    * the synthetic 'direct' channel one whole unit — so total credit
    * always equals the conversion count, up to the stated per-touch
    * rounding. The single-touch specializations are the as-of joins
    * (`ts_asof_purchase_click` IS last-touch); this is the multi-touch
    * generalization marketing/warehouse stacks report.
    *
    * Scale shape: the touch↔conversion pairing is a TIME-BINNED
    * equi-join — touches key to bin ⌊ts/W⌋ once, conversions probe
    * (bin−1, bin) — so the join key is (user, bin) and candidate
    * volume is per-(user, bin) occupancy², never per-user touches ×
    * conversions; the residual 0 < conv − touch ≤ W is exact integer
    * micros. The same bin-the-domain move as RangeJoin, 1-D. */
  def attribution(events: DataFrame,
                  touchTypes: Seq[String] = Seq("click", "view", "signup"),
                  convType: String = "purchase",
                  windowSec: Long = 1800L): DataFrame = {
    require(windowSec > 0, s"attribution: windowSec must be positive")
    val wUs = windowSec * 1000000L
    val touches = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts_us").as("tts"),
        col("event_type").as("channel"),
        expr(s"ts_us div $wUs").as("bin"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("ts_us").as("pts"),
        col("event_id").as("pid"))
      .withColumn("bin",
        explode(array(expr(s"pts div $wUs") - 1, expr(s"pts div $wUs"))))
    val matched = convs.join(touches, Seq("user_id", "bin"))
      .filter(col("tts") < col("pts") && col("pts") - col("tts") <= wUs)
      .select(col("pid"), col("channel"))
    val perConv = Window.partitionBy(col("pid"))
    val credited = matched
      .withColumn("ntouch", count(lit(1)).over(perConv))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(lit(1.0) / col("ntouch"), 6)
          .cast("decimal(18,6)")).cast("double"), 6).as("credit6"))
    val direct = convs.select(col("pid")).distinct()
      .join(matched.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .agg(count(lit(1)).as("n_events"))
      .select(lit("direct").as("channel"), col("n_events"),
        round(col("n_events").cast("double"), 6).as("credit6"))
    credited.unionByName(direct)
  }
}

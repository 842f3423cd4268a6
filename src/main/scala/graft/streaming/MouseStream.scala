package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's ingest path
  * (SURVEY §3.1, functions.js:190-233 + the inferred Lambda):
  *
  *   JSON events keyed by user_id
  *     → parse (from_json, fixed schema = the wire format of functions.js:211)
  *     → event-time watermark
  *     → tumbling 1-second window per user (the Lambda's ms→s truncation)
  *     → count + retained raw events (`movs`, functions.js:361-362)
  *     → update-mode sink (the DynamoDB UpdateItem upsert, PNG flow 4)
  *
  * The reference delegates ordering to Kinesis partition keys and
  * silently drops late updates (SURVEY T4); here the late-data contract
  * is explicit via the watermark.
  *
  * At scale: the aggregation state is hash-partitioned by
  * (user_id, window) across executors; watermarks bound state size;
  * `update` output mode emits only changed windows per micro-batch.
  */
object MouseStream {

  /** Wire format of one mouse event (functions.js:252-256 + session
    * key functions.js:212): {"user_id":…,"x":…,"y":…,"time":ms}. */
  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("time", LongType, nullable = false)))

  case class MouseEvent(user_id: String, x: Int, y: Int, time: Long)

  /** Parse a stream (or batch) of JSON lines into typed events, with
    * the reference's negative-coordinate clamp (functions.js:248-249).
    * Unparseable wire records are DROPPED — the reference's behavior;
    * a pipeline that must account for every byte uses
    * [[parseTagged]] and routes the quarantine. */
  def parse(raw: DataFrame): DataFrame =
    parseTagged(raw).filter(col("valid"))
      .drop("valid", "raw")

  /** [[parse]] without the silent drop: every input record survives,
    * tagged `valid`, with the raw wire payload carried on the invalid
    * rows (`raw`, null when valid — no double storage). The
    * production ingest contract: malformed records are DATA (counted,
    * quarantined, replayable after a parser fix), not an absence.
    * Split downstream with two filters or a foreachBatch router —
    * both read one stream, so the tag costs no extra source pass. */
  def parseTagged(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as("line"))
      .select(col("line"),
        from_json(col("line"), eventSchema).as("e"))
      .select(
        col("e.user_id").isNotNull.as("valid"),
        when(col("e.user_id").isNull, col("line")).as("raw"),
        col("e.user_id").as("user_id"),
        greatest(lit(0), col("e.x")).as("x"),
        greatest(lit(0), col("e.y")).as("y"),
        col("e.time").as("time"),
        timestamp_millis(col("e.time")).as("ts"))

  /** The core streaming aggregation (SURVEY A1+A2): per (user, 1s
    * tumbling window) count + retained events. `lateness` is the
    * explicit watermark the reference lacks. `retainRaw=false` drops
    * the `movs` retention (A1 only) — state then holds one counter
    * per active window instead of every event, a ~5× throughput
    * difference worth choosing deliberately. */
  def aggregate(events: DataFrame, lateness: String = "5 seconds",
                retainRaw: Boolean = true): DataFrame = {
    // empty lateness = input already carries a watermark (e.g. from
    // dedupWithinWatermark); redefining one is disallowed when
    // chaining stateful operators
    val marked =
      if (lateness.isEmpty) events else events.withWatermark("ts", lateness)
    val base = marked
      .groupBy(col("user_id"), window(col("ts"), "1 second"))
    val agged =
      if (retainRaw) base.agg(
        count(lit(1)).as("cnt"),
        collect_list(struct(col("x"), col("y"), col("time"))).as("movs"))
      else base.agg(count(lit(1)).as("cnt"), lit(null).as("movs"))
    agged.select(
      col("user_id"),
      unix_timestamp(col("window.start")).as("sec"),
      col("cnt"), col("movs"))
  }

  /** Ingest-to-memory-sink wiring: returns the started query. The
    * in-memory table plays the role of the DynamoDB aggregate table;
    * `Movements.range`-style reads go against it. */
  def startToMemory(spark: SparkSession, events: DataFrame,
                    tableName: String = "movements",
                    lateness: String = "5 seconds"): StreamingQuery =
    aggregate(events, lateness)
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(tableName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  /** Stream-stream interval join: pair each left event with the right
    * events of the SAME user that occur within [l_ts, l_ts +
    * withinSec] — cross-stream correlation (e.g. two capture surfaces
    * of one user, or click→follow-up attribution). Both sides carry
    * watermarks and the join predicate bounds event time on BOTH
    * streams, which is exactly what lets Spark EVICT state: a left
    * row is dropped once the right watermark passes l_ts + withinSec,
    * a right row once the left watermark passes r_ts — state is
    * O(withinSec × rate), not unbounded. Inner join in append mode;
    * results emit as soon as both sides are present (matched rows
    * don't wait for the watermark — only state cleanup does). */
  def correlate(left: DataFrame, right: DataFrame, withinSec: Long,
                lateness: String = "5 seconds"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("x").as("l_x"), col("y").as("l_y"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("x").as("r_x"), col("y").as("r_y"))
      .withWatermark("r_ts", lateness)
    l.join(r,
        col("user_id") === col("r_user_id") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSec SECONDS"))
      .drop("r_user_id")
  }

  /** Streaming sessionization: event-time session windows closed by a
    * `gap` of silence per user — the streaming form of
    * Movements.sessions (the batch gap-based variant). Emits one row
    * per completed session in append mode once the watermark passes
    * the gap. */
  def sessionize(events: DataFrame, gap: String = "10 seconds",
                 lateness: String = "5 seconds"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** A6 — the live `events_tracked` counter (functions.js:19,257) as
    * an `observe` metric: the count rides each micro-batch's
    * QueryProgress without a second aggregation or another sink. Read
    * it from `StreamingQueryProgress.observedMetrics("tracking")`. */
  def withTracking(events: DataFrame): DataFrame =
    events.observe("tracking", count(lit(1)).as("events_tracked"))

  /** Streaming deduplication: drop redelivered events (same user,
    * coordinates and timestamp — the reference's fire-and-forget
    * PutRecords can double-deliver, SURVEY T7) while keeping state
    * bounded by the watermark. Insert between parse and aggregate for
    * effectively-once counting over an at-least-once transport. */
  def dedupWithinWatermark(events: DataFrame,
                           lateness: String = "5 seconds"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "x", "y", "time")

  /** S6 — the upsert sink (the reference's off-repo Lambda writing
    * DynamoDB via UpdateItem, architecture PNG flow 4): update-mode
    * aggregation through `foreachBatch`, handing each micro-batch's
    * changed (user, sec) rows to a keyed merge function. Unlike the
    * memory sink this supports checkpoint recovery — stop/restart
    * resumes from the offsets+state under `checkpointDir`, so the
    * merged table converges exactly-once per key. */
  def startToUpsert(spark: SparkSession, events: DataFrame,
                    checkpointDir: String,
                    lateness: String = "5 seconds")
                   (merge: DataFrame => Unit): StreamingQuery =
    aggregate(events, lateness)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => merge(batch) }
      .trigger(Trigger.ProcessingTime(0))
      .start()

  /** The REST query surface (functions.js:156, 312, 351) as typed
    * Scala over the aggregate table — the three call shapes:
    *   - incremental poll:  fromSec exclusive, ascending
    *   - initial load:      reverse=true seeded at `now`
    *   - heatmap read:      reverse + limit + raw `movs`
    *
    * In `update` mode the memory sink may hold several versions of a
    * (user, sec) row — later micro-batches re-emit updated windows; the
    * max-cnt row is the current state (counts only grow), mirroring the
    * DynamoDB upsert the reference reads (SURVEY S6/S7).
    */
  def range(spark: SparkSession, table: String, userId: String, fromSec: Long,
            reverse: Boolean = false, limit: Option[Int] = None,
            includeRaw: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("sec"))
      .orderBy(col("cnt").desc)
    val base = spark.table(table)
      .filter(col("user_id") === userId)
      .filter(if (reverse) col("sec") <= fromSec else col("sec") > fromSec)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val ordered = if (reverse) base.orderBy(col("sec").desc)
                  else base.orderBy(col("sec").asc)
    val limited = limit.fold(ordered)(ordered.limit)
    if (includeRaw) limited else limited.drop("movs")
  }

  /** Client-side poll step (SURVEY §3.2): SUM(cnt) over rows after the
    * continuation token, plus the advanced token (max sec seen). */
  def pollSum(rows: DataFrame): (Long, Option[Long]) = {
    val agg = rows.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("total"),
      max(col("sec")).as("max_sec")).collect()(0)
    (agg.getLong(0), Option(agg.get(1)).map(_.asInstanceOf[Long]))
  }
}

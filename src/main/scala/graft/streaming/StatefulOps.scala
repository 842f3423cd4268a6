package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators — the parts of the reference pipeline
  * whose state crosses micro-batch boundaries (SURVEY §7.4).
  *
  * The batch LOCF (Movements.locf) recomputes over a bounded window per
  * read, which is what the reference does (functions.js:351 re-reads the
  * last 10 seconds). The streaming form below instead carries the last
  * real position in keyed state, so sentinel resolution is continuous
  * and O(1) per event — the scale-correct shape: state is partitioned
  * by user across executors, checkpointed, and recovered on restart.
  */
object StatefulOps {

  case class PositionedEvent(user_id: String, x: Int, y: Int, time: Long)
  case class ResolvedEvent(user_id: String, x: Int, y: Int, time: Long,
                           carried: Boolean)
  case class LastPos(x: Int, y: Int)

  /** Is this the reference's heartbeat sentinel? (functions.js:365 —
    * including its deliberate conflation of a genuine (0,0) position,
    * documented in SURVEY §7.4.) */
  def isSentinel(e: PositionedEvent): Boolean = e.x == 0 && e.y == 0

  /** Streaming LOCF: resolve sentinels to the user's last real
    * position, carrying state across micro-batches. Events inside one
    * batch are processed in event-time order; leading sentinels (no
    * prior position ever) are dropped — the reference's `if (id)` guard
    * (functions.js:381).
    *
    * STATE BOUND: per-key state is one [[LastPos]] (two ints), but
    * without eviction the key SET grows with every user ever seen —
    * at 100× keys that unbounded map is the first thing to OOM.
    * `stateTtlMs > 0` arms a processing-time timeout per key, renewed
    * on every arrival: a key idle past the TTL is REMOVED (the state
    * store count stays ~ the live-key working set, spec-asserted
    * under key churn). Semantics after eviction are explicit: the key
    * is indistinguishable from never-seen, so a returning user's
    * leading sentinel drops until a real position re-arrives — the
    * right call for LOCF, where carrying a position across a long
    * silence is stale anyway (the reference itself only ever re-reads
    * the last 10 s). 0 disables eviction (exact unbounded carry). */
  def locfResolve(events: Dataset[PositionedEvent],
                  stateTtlMs: Long = 0L): Dataset[ResolvedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastPos, ResolvedEvent](
        OutputMode.Append, timeoutConf) {
        (uid: String, batch: Iterator[PositionedEvent], state: GroupState[LastPos]) =>
          if (stateTtlMs > 0 && state.hasTimedOut) {
            state.remove() // idle past TTL: evict, emit nothing
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[ResolvedEvent]
            var last = state.getOption
            batch.toSeq.sortBy(e => (e.time, e.x, e.y)).foreach { e =>
              if (isSentinel(e)) {
                last.foreach(p =>
                  out += ResolvedEvent(uid, p.x, p.y, e.time, carried = true))
                // no prior position → leading sentinel → dropped
              } else {
                last = Some(LastPos(e.x, e.y))
                out += ResolvedEvent(uid, e.x, e.y, e.time, carried = false)
              }
            }
            last.foreach(state.update)
            // re-arm the eviction clock only where state exists: a key
            // that never produced a position holds nothing to evict
            if (stateTtlMs > 0 && state.exists)
              state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }

  /** The same LOCF semantics on the Spark 4 `transformWithState`
    * API — a [[StatefulProcessor]] with a [[ValueState]] per user.
    * Requires the RocksDB state store provider. The
    * flatMapGroupsWithState form above remains the default (no
    * provider requirement); this is the forward-looking variant with
    * finer state control (TTL, timers, multiple state variables). */
  class LocfProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, PositionedEvent, ResolvedEvent] {
    @transient private var lastPos: ValueState[LastPos] = _

    // the state-bound knob on this runtime is declarative: TTLConfig
    // hands eviction to the state store itself (RocksDB compaction
    // drops expired rows) instead of a per-key timer
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastPos = getHandle.getValueState[LastPos](
        "lastPos", Encoders.product[LastPos], ttl)

    override def handleInputRows(uid: String,
        rows: Iterator[PositionedEvent],
        timers: TimerValues): Iterator[ResolvedEvent] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ResolvedEvent]
      var last = if (lastPos.exists()) Some(lastPos.get()) else None
      rows.toSeq.sortBy(e => (e.time, e.x, e.y)).foreach { e =>
        if (isSentinel(e)) {
          last.foreach(p =>
            out += ResolvedEvent(uid, p.x, p.y, e.time, carried = true))
        } else {
          last = Some(LastPos(e.x, e.y))
          out += ResolvedEvent(uid, e.x, e.y, e.time, carried = false)
        }
      }
      last.foreach(lastPos.update)
      out.iterator
    }
  }

  /** [[locfResolve]] on the transformWithState runtime. A non-NONE
    * `ttl` needs processing-time mode (the store evicts by that
    * clock). */
  def locfResolveTws(events: Dataset[PositionedEvent],
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[ResolvedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new LocfProcessor(ttl),
        timeMode, OutputMode.Append)
  }

  case class HeartbeatState(lastEventMs: Long)

  /** S3 — the zero-fill heartbeat (functions.js:196-204) moved off the
    * client into the stream: a user silent for a full interval gets a
    * sentinel {0,0} emitted via processing-time timeout, so every
    * interval has ≥1 record downstream. Exposed as a standalone
    * function so the timeout branch is unit-testable with
    * `TestGroupState` (no wall-clock in tests). */
  def heartbeatFn(intervalMs: Long)(
      uid: String, events: Iterator[PositionedEvent],
      state: GroupState[HeartbeatState]): Iterator[PositionedEvent] =
    if (state.hasTimedOut) {
      val now = state.getCurrentProcessingTimeMs()
      state.setTimeoutDuration(intervalMs)
      Iterator.single(PositionedEvent(uid, 0, 0, now))
    } else {
      val batch = events.toVector
      batch.lastOption.foreach(e => state.update(HeartbeatState(e.time)))
      state.setTimeoutDuration(intervalMs)
      batch.iterator
    }

  /** Streaming wiring of [[heartbeatFn]]. */
  def withHeartbeats(events: Dataset[PositionedEvent],
                     intervalMs: Long = 1000L): Dataset[PositionedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HeartbeatState, PositionedEvent](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        heartbeatFn(intervalMs))
  }

  /** S4 — the keyed JSON sink shape (functions.js:206-232): one JSON
    * record per event, partition key = user_id. This is the projection
    * a Kafka/Kinesis `writeStream` consumes (`key`/`value`); writing it
    * to files partitioned by key gives the same per-key locality
    * offline. */
  def toKeyedJson(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("key"),
      to_json(struct(col("user_id"), col("x"), col("y"), col("time")))
        .as("value"))
}

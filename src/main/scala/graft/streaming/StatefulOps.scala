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
    * (functions.js:381). */
  def locfResolve(events: Dataset[PositionedEvent]): Dataset[ResolvedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastPos, ResolvedEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: String, batch: Iterator[PositionedEvent], state: GroupState[LastPos]) =>
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
          out.iterator
      }
  }

  /** The same LOCF semantics on the Spark 4 `transformWithState`
    * API — a [[StatefulProcessor]] with a [[ValueState]] per user.
    * Requires the RocksDB state store provider. The
    * flatMapGroupsWithState form above remains the default (no
    * provider requirement); this is the forward-looking variant with
    * finer state control (TTL, timers, multiple state variables). */
  class LocfProcessor
      extends StatefulProcessor[String, PositionedEvent, ResolvedEvent] {
    @transient private var lastPos: ValueState[LastPos] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastPos = getHandle.getValueState[LastPos](
        "lastPos", Encoders.product[LastPos], TTLConfig.NONE)

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

  /** [[locfResolve]] on the transformWithState runtime. */
  def locfResolveTws(events: Dataset[PositionedEvent]): Dataset[ResolvedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new LocfProcessor,
        TimeMode.None(), OutputMode.Append)
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

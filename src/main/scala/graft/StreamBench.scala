package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.MouseStream

/** Streaming throughput benchmark: sustained events/second through the
  * full reference pipeline — JSON wire encode → parse → clamp →
  * event-time watermark → per-(user, 1s window) count + retention —
  * driven by the rate source.
  *
  * Prints one JSON line {"metric":"stream_events_per_sec",...}.
  * For context, the reference's envelope is ~60-125 events/s per
  * client with a 1 s flush (BASELINE.md); this measures the
  * single-node ceiling of the Spark re-expression.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val eventsPerSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "500000").toLong
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val spark = GraftSession.get()
    import spark.implicits._

    // rate source → the reference wire format (functions.js:211)
    val wire = new graft.sources.RateJsonSource(eventsPerSec).load(spark)

    val retainRaw = sys.env.getOrElse("SPARK_GRAFT_STREAM_RETAIN", "true").toBoolean
    val agg = MouseStream.aggregate(MouseStream.parse(wire),
      lateness = "2 seconds", retainRaw = retainRaw)

    val q = agg.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format("noop").mode("overwrite").save()
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    Thread.sleep(seconds * 1000L)
    q.stop()
    // engine-reported input throughput: all non-empty batches after the
    // first (the first pays codegen + state-store init)
    val nonEmpty = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val steady = if (nonEmpty.length > 1) nonEmpty.tail else nonEmpty
    val events = steady.map(_.numInputRows).sum
    val wallSec = steady.map(p => p.batchDuration / 1000.0).sum
    val perSec = if (wallSec > 0) events / wallSec else 0.0
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.0f", Double.box(v))
    println(s"""{"metric":"stream_events_per_sec","value":${fmt(perSec)},"unit":"events/sec","configured_rate":$eventsPerSec,"batches":${steady.length},"events":$events}""")
    spark.stop()
  }
}

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
    // "events" = the reference pipeline; "corpus" = the training-data
    // front door (PII mask → gates → watermarked signature dedup,
    // optionally + frozen-LM scoring per micro-batch)
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "events")
    val spark = GraftSession.get()
    import spark.implicits._

    val q = if (mode == "corpus") {
      val withLm = sys.env.getOrElse("SPARK_GRAFT_STREAM_LM", "false").toBoolean
      // rate source → synthetic documents: ~24 tokens each, token mix
      // varying with the row value so signatures stay distinct and the
      // gates pass — measuring pipeline cost, not reject shortcuts
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", eventsPerSec).load()
      val toks = (0 until 24).map(i =>
        concat(lit("w"), pmod(col("value") * lit(2 * i + 7), lit(997))))
      val docs = rate.select(col("value").as("doc_id"),
        col("timestamp").as("ts"), concat_ws(" ", toks: _*).as("text"))
      val admitted = graft.streaming.CorpusIngest
        .ingest(docs, lateness = "2 seconds")
      val model =
        if (!withLm) null
        else graft.text.TextAnalysis.trainLm(
          spark.range(1000).select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 24).map(i =>
              concat(lit("w"), pmod(col("id") * lit(2 * i + 7), lit(997)))): _*)
              .as("text")))
      admitted.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val out = if (model == null) batch
            else graft.streaming.CorpusIngest.lmGate(batch, model, 10.0)
          out.write.format("noop").mode("overwrite").save()
        }
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
    } else {
      // rate source → the reference wire format (functions.js:211)
      val wire = new graft.sources.RateJsonSource(eventsPerSec).load(spark)
      val retainRaw = sys.env.getOrElse("SPARK_GRAFT_STREAM_RETAIN", "true").toBoolean
      val agg = MouseStream.aggregate(MouseStream.parse(wire),
        lateness = "2 seconds", retainRaw = retainRaw)
      agg.writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.format("noop").mode("overwrite").save()
        }
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
    }

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
    val metric = if (mode == "corpus") "stream_docs_per_sec"
                 else "stream_events_per_sec"
    val unit = if (mode == "corpus") "docs/sec" else "events/sec"
    println(s"""{"metric":"$metric","value":${fmt(perSec)},"unit":"$unit","configured_rate":$eventsPerSec,"batches":${steady.length},"events":$events}""")
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-backed simulation of a Kinesis stream, faithful to the
  * producer/consumer contract the reference exercises
  * (functions.js:206-232: `PutRecords` of `{Data, PartitionKey}`
  * batches; the consumer sees `data/partitionKey/sequenceNumber` per
  * record) — the honest stand-in for SURVEY S4/S5 in an offline build
  * where no AWS endpoint or connector jar exists.
  *
  * Semantics simulated, not hand-waved:
  *  - **Sharding**: a record lands on shard `hash(partitionKey) mod
  *    nShards` — every record of one partition key goes to ONE shard,
  *    which is the mechanism Kinesis uses to give per-key ordering.
  *  - **PutRecords flush limit**: a single call carries at most 500
  *    records (the API cap the reference's 1 s flush loop relies on
  *    staying under); [[ShardedProducer.putRecords]] enforces it by
  *    splitting, like the AWS SDK caller must.
  *  - **Per-shard sequence numbers**: strictly increasing longs
  *    assigned at write, never reused across flushes — the consumer
  *    can (and the spec does) assert per-key arrival order by them.
  *  - **GetRecords batching**: each flush becomes one JSON-lines file
  *    under `shard-N/`; the consumer reads each shard directory as a
  *    file stream with `maxFilesPerTrigger=1`, so a micro-batch
  *    consumes at most one GetRecords-worth of data per shard, oldest
  *    first — the iterator semantics of a real shard reader.
  *
  * The consumer output schema matches [[KinesisRecords.toWire]]'s
  * input contract (`data: binary`, `partitionKey`, `sequenceNumber`),
  * so the full ingest pipeline — wire projection, JSON parse, window
  * aggregation, upsert sink — runs unchanged against the simulation,
  * and swapping in a real connector stream is a one-line change in
  * [[ConnectorSource]].
  */
object SimulatedKinesis {

  /** PutRecords API cap: records per call. */
  val MaxRecordsPerPut = 500

  /** Shard assignment: deterministic hash of the partition key. Real
    * Kinesis buckets an MD5 of the key over the shard hash-key ranges;
    * any fixed hash gives the property that matters — one key, one
    * shard. */
  def shardFor(partitionKey: String, nShards: Int): Int = {
    val h = java.util.Arrays.hashCode(partitionKey.getBytes("UTF-8"))
    math.floorMod(h, nShards)
  }

  /** Minimal JSON string escaping for the record line's partitionKey
    * field — quote, backslash, and control chars (as \uXXXX): exactly
    * the characters that would break the one-line-per-record framing
    * or the quoted-field parse. Data needs none (base64). Every
    * writer of the line format (this producer, the V2 sink, the HTTP
    * producer endpoint) escapes with this; every parser unescapes
    * with [[jsonUnescape]]. */
  private[sources] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  /** Inverse of [[jsonEscape]] (also tolerates the standard JSON
    * short escapes a hand-written client might send). */
  private[sources] def jsonUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '/' => sb.append('/'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Producer half: accumulates `putRecords` calls into per-shard
    * JSON-lines batch files under `dir/shard-N/`. Not thread-safe —
    * one producer instance per simulated client, like one SDK client. */
  final class ShardedProducer(dir: String, nShards: Int) {
    require(nShards >= 1, "need at least one shard")
    private val seq = Array.fill(nShards)(0L)
    private val flushIdx = Array.fill(nShards)(0)
    // Spark's file source orders same-mtime files arbitrarily, and
    // sub-second writes collide at ms mtime resolution — stamp every
    // batch file with a strictly increasing mtime so the stream
    // replays in write order (the file-sim carrier of what Kinesis
    // expresses through sequence numbers)
    private val t0 = System.currentTimeMillis()
    private var fileNo = 0
    (0 until nShards).foreach { s =>
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, s"shard-$s"))
    }

    /** One PutRecords call: (data, partitionKey) pairs. Splits into
      * ≤500-record chunks (the API rejects larger calls); each chunk
      * writes one batch file per shard touched. Returns the number of
      * API calls made. */
    def putRecords(records: Seq[(String, String)]): Int = {
      val calls = records.grouped(MaxRecordsPerPut).toSeq
      calls.foreach { call =>
        call.groupBy { case (_, pk) => shardFor(pk, nShards) }
          .toSeq.sortBy(_._1)
          .foreach { case (shard, recs) =>
            val lines = recs.map { case (data, pk) =>
              val sn = seq(shard); seq(shard) += 1
              // compact JSON, no library needed: data is base64 so the
              // payload never fights the JSON escaping rules
              val b64 = java.util.Base64.getEncoder
                .encodeToString(data.getBytes("UTF-8"))
              s"""{"sequenceNumber":"$sn","partitionKey":"${jsonEscape(pk)}","data":"$b64"}"""
            }
            val f = java.nio.file.Paths.get(dir, s"shard-$shard",
              f"batch-${flushIdx(shard)}%06d.json")
            flushIdx(shard) += 1
            java.nio.file.Files.write(f,
              (lines.mkString("\n") + "\n").getBytes("UTF-8"))
            fileNo += 1
            java.nio.file.Files.setLastModifiedTime(f,
              java.nio.file.attribute.FileTime.fromMillis(t0 + fileNo * 1000L))
          }
      }
      calls.size
    }

    /** Per-shard record counts written so far (spec introspection). */
    def sequenceCounts: Seq[Long] = seq.toSeq
  }

  private val recordSchema: StructType = StructType(Seq(
    StructField("sequenceNumber", StringType),
    StructField("partitionKey", StringType),
    StructField("data", StringType)))

  /** Consumer half: one file stream PER SHARD, unioned. Per-shard
    * streams (not one glob over the parent) preserve the real
    * consumer's structure — each shard is an independent ordered
    * iterator, and `maxFilesPerTrigger=1` caps a micro-batch at one
    * batch file per shard so ordering across micro-batches is the
    * per-shard write order. Emits the connector record shape plus
    * `shardId` for diagnostics. */
  def load(spark: SparkSession, dir: String, nShards: Int,
           filesPerTrigger: Int = 1): DataFrame =
    (0 until nShards).map { s =>
      spark.readStream
        .option("maxFilesPerTrigger", filesPerTrigger)
        .text(s"$dir/shard-$s")
        .select(from_json(col("value"), recordSchema).as("r"))
        .select(
          unbase64(col("r.data")).as("data"),
          col("r.partitionKey").as("partitionKey"),
          col("r.sequenceNumber").as("sequenceNumber"),
          lit(s"shard-$s").as("shardId"))
    }.reduce(_ unionAll _)
}

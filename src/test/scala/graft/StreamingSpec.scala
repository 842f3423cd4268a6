package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MouseStream

/** End-to-end streaming slice (SURVEY §7.1): MemoryStream of JSON wire
  * events → parse → watermarked 1s window agg → memory sink → range
  * query API → poll SUM with continuation token. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def json(uid: String, x: Int, y: Int, ms: Long): String =
    s"""{"user_id":"$uid","x":$x,"y":$y,"time":$ms}"""

  test("ingest → window agg → range query → poll sum") {
    val input = MemoryStream[String](spark)
    val events = MouseStream.parse(input.toDF().withColumnRenamed("value", "value"))
    val query = MouseStream.startToMemory(spark, events, "movements_t1")
    try {
      // second 100: 3 events; second 101: sentinel only; second 102: 2 events
      input.addData(
        json("u1", 10, 20, 100000),
        json("u1", 11, 21, 100200),
        json("u1", 12, 22, 100900),
        json("u1", 0, 0, 101000),
        json("u1", 30, 40, 102100),
        json("u1", -5, 41, 102500), // negative x clamps to 0
        json("u2", 7, 7, 100500))
      query.processAllAvailable()

      val rows = MouseStream.range(spark, "movements_t1", "u1", fromSec = 99L)
      val bySec = rows.collect().map(r =>
        r.getAs[Long]("sec") -> r.getAs[Long]("cnt")).toMap
      assert(bySec == Map(100L -> 3L, 101L -> 1L, 102L -> 2L))

      // poll: total and continuation token
      val (total, token) = MouseStream.pollSum(rows)
      assert(total == 6L && token.contains(102L))

      // incremental poll after token: nothing new yet
      val (t2, tok2) = MouseStream.pollSum(
        MouseStream.range(spark, "movements_t1", "u1", fromSec = token.get))
      assert(t2 == 0L && tok2.isEmpty)

      // late-but-in-watermark event updates its window
      input.addData(json("u1", 13, 23, 100999))
      query.processAllAvailable()
      val updated = MouseStream.range(spark, "movements_t1", "u1", fromSec = 99L)
        .filter(col("sec") === 100L).collect()(0)
      assert(updated.getAs[Long]("cnt") == 4L)
    } finally query.stop()
  }

  test("reverse + limit + raw movs (heatmap read shape)") {
    val input = MemoryStream[String](spark)
    val events = MouseStream.parse(input.toDF())
    val query = MouseStream.startToMemory(spark, events, "movements_t2")
    try {
      input.addData((0 until 12).map(s =>
        json("u1", s, s, 200000L + s * 1000L)): _*)
      query.processAllAvailable()
      val rows = MouseStream.range(spark, "movements_t2", "u1",
        fromSec = 10000L, reverse = true, limit = Some(10), includeRaw = true)
        .collect()
      assert(rows.length == 10)
      val secs = rows.map(_.getAs[Long]("sec")).toSeq
      assert(secs == secs.sorted.reverse && secs.head == 211L)
      assert(rows.head.getAs[scala.collection.Seq[Any]]("movs").nonEmpty)
    } finally query.stop()
  }

  test("streaming dedup drops redelivered events before the aggregation") {
    val input = MemoryStream[String](spark)
    val deduped = MouseStream.dedupWithinWatermark(
      MouseStream.parse(input.toDF()))
    val q = MouseStream.startToMemory(spark, deduped, "movements_dedup",
      lateness = "")
    try {
      val e = json("u1", 10, 20, 900000)
      input.addData(e, e, json("u1", 11, 21, 900500)) // duplicate in-batch
      q.processAllAvailable()
      input.addData(e) // redelivery in a later batch, inside watermark
      q.processAllAvailable()
      val cnt = MouseStream.range(spark, "movements_dedup", "u1", 0L)
        .filter(col("sec") === 900L).collect()(0).getAs[Long]("cnt")
      assert(cnt == 2L) // 3 deliveries of e collapsed to 1, plus 1 distinct
    } finally q.stop()
  }

  test("file source replays JSON-lines archives through the same pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_files").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part1.json"),
      Seq(json("u1", 1, 2, 700000), json("u1", 3, 4, 700500),
        json("u2", 5, 6, 701000)).mkString("\n"))
    val src = new graft.sources.FileJsonSource(dir)
    val q = MouseStream.startToMemory(spark,
      MouseStream.parse(src.load(spark)), "movements_files")
    try {
      q.processAllAvailable()
      val bySec = MouseStream.range(spark, "movements_files", "u1", 0L)
        .collect().map(r => r.getAs[Long]("sec") -> r.getAs[Long]("cnt")).toMap
      assert(bySec == Map(700L -> 2L))
    } finally q.stop()
  }

  test("AvailableNow trigger drains the backlog then stops on its own") {
    // the batch-catchup mode: process everything present, terminate —
    // how an operator re-runs the pipeline over an archive without a
    // resident query
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "backlog.json"),
      Seq(json("u9", 1, 1, 900000), json("u9", 2, 2, 900400),
        json("u9", 3, 3, 901000)).mkString("\n"))
    val src = new graft.sources.FileJsonSource(dir)
    val q = MouseStream.aggregate(MouseStream.parse(src.load(spark)))
      .select(col("user_id"), col("sec"), col("cnt"))
      .writeStream.format("memory").outputMode("update")
      .queryName("avnow_t")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query did not self-stop")
      val bySec = spark.table("avnow_t").collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(bySec == Map(900L -> 2L, 901L -> 1L), s"got $bySec")
    } finally q.stop()
  }

  test("streaming session windows close on gaps (event time)") {
    val input = MemoryStream[String](spark)
    val sessions = MouseStream.sessionize(
      MouseStream.parse(input.toDF()), gap = "10 seconds", lateness = "0 seconds")
    val q = sessions.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("sessions_t").start()
    try {
      // session A: 3 events within 10s gaps; then 100s silence;
      // session B: 1 event; a late high ts advances the watermark
      input.addData(
        json("u1", 1, 1, 100000), json("u1", 2, 2, 105000),
        json("u1", 3, 3, 112000),
        json("u1", 4, 4, 250000),
        json("u2", 9, 9, 400000)) // watermark pusher
      q.processAllAvailable()
      input.addData(json("u2", 9, 9, 500000)) // push watermark further
      q.processAllAvailable()
      val got = spark.table("sessions_t").filter(col("user_id") === "u1")
        .orderBy("session_start").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == Seq((100L, 122L, 3L), (250L, 260L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs same-user events within the bound") {
    val lin = MemoryStream[String](spark)
    val rin = MemoryStream[String](spark)
    val joined = MouseStream.correlate(
      MouseStream.parse(lin.toDF()), MouseStream.parse(rin.toDF()),
      withinSec = 5, lateness = "2 seconds")
    val q = joined.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("corr_t").start()
    try {
      lin.addData(json("u1", 1, 1, 10000), json("u2", 2, 2, 10000))
      rin.addData(
        json("u1", 7, 7, 12000),  // u1 +2s: match
        json("u1", 8, 8, 17000),  // u1 +7s: outside the 5s bound
        json("u3", 9, 9, 12000))  // no left partner
      q.processAllAvailable()
      // advance both watermarks so state for the old interval closes
      lin.addData(json("wm", 0, 0, 100000))
      rin.addData(json("wm", 0, 0, 100000))
      q.processAllAvailable()
      val got = spark.table("corr_t")
        .select("user_id", "l_x", "r_x").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == Set(("u1", 1, 7), ("wm", 0, 0)),
        s"got $got")
      // join state must be bounded: the plan carries watermarks on both sides
      val p = q.lastProgress
      assert(p.eventTime.get("watermark") != null, "no watermark tracked")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events in-flight") {
    // the dimension side is a plain DataFrame joined per micro-batch;
    // broadcast keeps the stream side shuffle-free
    val segments = Seq(("u1", "gold"), ("u2", "trial")).toDF("uid", "segment")
    val input = MemoryStream[String](spark)
    val enriched = MouseStream.parse(input.toDF())
      .join(broadcast(segments), $"user_id" === $"uid", "left_outer")
      .select($"user_id", $"x", $"y", coalesce($"segment", lit("unknown")).as("segment"))
    val q = enriched.writeStream.format("memory").outputMode("append")
      .queryName("enrich_t1").start()
    try {
      input.addData(json("u1", 1, 2, 100000), json("u3", 3, 4, 100100))
      q.processAllAvailable()
      val got = spark.table("enrich_t1").collect()
        .map(r => r.getAs[String]("user_id") -> r.getAs[String]("segment")).toMap
      assert(got == Map("u1" -> "gold", "u3" -> "unknown"))
    } finally q.stop()
  }

  test("KMV sketch aggregates incrementally in a streaming window") {
    // the bounded-state sketch composes with update-mode streaming
    // aggregation like any built-in: per-user distinct-page estimate
    val kmv = org.apache.spark.sql.functions.udaf(
      new graft.functions.KmvSketch(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val input = MemoryStream[(Long, Long)](spark)
    val agg = input.toDF().toDF("user_id", "page_id")
      .groupBy($"user_id")
      .agg(kmv(graft.functions.Portable.hash52($"page_id")).as("approx_pages"))
    val q = agg.writeStream.format("memory").outputMode("complete")
      .queryName("kmv_t1").start()
    try {
      input.addData((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L))
      q.processAllAvailable()
      input.addData((1L, 2L), (1L, 3L), (2L, 99L)) // dup pages + one new
      q.processAllAvailable()
      val got = spark.table("kmv_t1").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // below-k cardinalities are exact by construction
      assert(got == Map(1L -> 3.0, 2L -> 2.0))
    } finally q.stop()
  }

  test("Misra-Gries candidates aggregate incrementally in a streaming query") {
    // the frequent-items sketch composes with streaming aggregation
    // exactly like KMV: bounded state per group, mergeable partials
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGries(8),
      org.apache.spark.sql.Encoders.STRING)
    val input = MemoryStream[(Long, String)](spark)
    val agg = input.toDF().toDF("user_id", "term")
      .groupBy($"user_id")
      .agg(mg($"term").as("sketch"))
    val q = agg.writeStream.format("memory").outputMode("complete")
      .queryName("mg_t1").start()
    try {
      input.addData((1L, "hot"), (1L, "a"), (1L, "hot"), (1L, "b"))
      q.processAllAvailable()
      input.addData((1L, "hot"), (1L, "c"), (1L, "hot"))
      q.processAllAvailable()
      val row = spark.table("mg_t1").head()
      // the sketch is a real struct column (array of keys, n, err)
      val sk = row.getStruct(row.fieldIndex("sketch"))
      val (keys, n, err) =
        (sk.getSeq[String](0), sk.getLong(1), sk.getLong(2))
      assert(n == 7, s"processed $n rows")
      // "hot" (freq 4 > err bound) must be tracked across micro-batches
      assert(keys.contains("hot"), s"candidates: $keys, err=$err")
    } finally q.stop()
  }

  test("observe() exposes the live events_tracked counter (A6)") {
    val input = MemoryStream[String](spark)
    val tracked = MouseStream.withTracking(MouseStream.parse(input.toDF()))
    val q = MouseStream.startToMemory(spark, tracked, "tracked_t")
    try {
      input.addData(json("u1", 1, 1, 1000), json("u1", 2, 2, 1500))
      q.processAllAvailable()
      val metric = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("tracking")))
        .map(_.getAs[Long]("events_tracked")).sum
      assert(metric == 2L)
    } finally q.stop()
  }

  test("Kinesis-shaped records project onto the wire contract") {
    import graft.sources.KinesisRecords
    val records = Seq(
      (json("u1", 4, 5, 33000).getBytes("UTF-8"), "u1", "seq-1"),
      (json("u2", 6, 7, 34000).getBytes("UTF-8"), "u2", "seq-2"))
      .toDF("data", "partitionKey", "sequenceNumber")
    val parsed = MouseStream.parse(KinesisRecords.toWire(records))
      .orderBy("user_id").collect()
    assert(parsed.map(_.getAs[String]("user_id")).toSeq == Seq("u1", "u2"))
    assert(parsed(0).getAs[Int]("x") == 4 && parsed(1).getAs[Int]("y") == 7)
  }

  test("clamp: negative coordinates arrive as 0 (functions.js:248-249)") {
    val df = MouseStream.parse(
      Seq(json("u9", -3, -1, 5000)).toDF("value"))
    val r = df.collect()(0)
    assert(r.getAs[Int]("x") == 0 && r.getAs[Int]("y") == 0)
  }

  test("delta dedup composes stream-static: arriving docs flagged against the corpus index") {
    import graft.dedup.Dedup
    // the corpus band index is a static frame (in production: the
    // maintained band table); arriving documents band stateless and
    // stream-static join flags collisions in-flight
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "completely different words about spark shuffles and partitions here"))
      .toDF("doc_id", "text")
    val corpusBands = Dedup.minhashBands(corpus)
      .withColumnRenamed("doc_id", "corpus_id")
    val in = MemoryStream[(Long, String)](spark)
    val flagged = Dedup.minhashBands(in.toDF().toDF("doc_id", "text"))
      .join(corpusBands, Seq("band", "key"))
      .groupBy(col("doc_id"))
      .agg(min(col("corpus_id")).as("dup_of"))
    val q = flagged.writeStream.format("memory").queryName("delta_stream_t")
      .outputMode("complete").start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2L, "entirely novel content sharing nothing with the corpus at all today"))
      q.processAllAvailable()
      val got = spark.table("delta_stream_t").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == Seq((1L, 100L)), s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("stateless text ops run unchanged on streams (scrub + chunk)") {
    import graft.text.TextAnalysis
    // piiScrub and chunk are pure projections (no state, no
    // aggregation), so the SAME operator code composes onto a
    // streaming DataFrame in append mode — corpus cleaning as data
    // arrives, not as a separate batch codepath
    val in1 = MemoryStream[(Long, String)](spark)
    val q1 = TextAnalysis.piiScrub(in1.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream_t")
      .outputMode("append").start()
    try {
      in1.addData((1L, "reach me at a@b.co or 10.1.2.3"), (2L, "clean text"))
      q1.processAllAvailable()
      val got = spark.table("pii_stream_t").orderBy("doc_id").collect()
        .map(r => (r.getInt(1), r.getInt(2)))
      assert(got.toSeq == Seq((1, 1), (0, 0)))
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)](spark)
    val q2 = TextAnalysis.chunk(in2.toDF().toDF("doc_id", "text"),
        chunkTokens = 3, overlap = 1)
      .writeStream.format("memory").queryName("chunk_stream_t")
      .outputMode("append").start()
    try {
      in2.addData((1L, "a b c d e")) // 5 tokens, step 2 → 2 chunks
      q2.processAllAvailable()
      val got = spark.table("chunk_stream_t").orderBy("chunk_idx").collect()
        .map(r => (r.getLong(1), r.getInt(2)))
      assert(got.toSeq == Seq((0L, 3), (1L, 3)))
    } finally q2.stop()
  }

  test("streaming corpus index: df counts maintained in-flight equal the batch index") {
    // the lexical index behind Retrieval.bm25 is two aggregates
    // (per-(doc, term) tf, per-term df). Both are incrementally
    // maintainable as update/complete-mode streaming aggregations —
    // arriving docs flow through the SAME tokenization, stateful
    // dropDuplicates dedups (doc, term) pairs across batches, and the
    // running df equals a batch recompute at every point. (Production
    // would watermark doc arrival time to bound the dedup state; the
    // corpus here is tiny and unexpired.)
    val in = MemoryStream[(Long, String)](spark)
    val dfCounts = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.Portable.tokens(col("text"))).as("term"))
      .dropDuplicates("doc_id", "term")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = dfCounts.writeStream.format("memory").queryName("df_stream_t")
      .outputMode("complete").start()
    try {
      in.addData((1L, "apple banana"), (2L, "apple fig"))
      q.processAllAvailable()
      in.addData((3L, "banana apple apple")) // repeat counts once per doc
      q.processAllAvailable()
      val got = spark.table("df_stream_t").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("apple" -> 3L, "banana" -> 2L, "fig" -> 1L))
    } finally q.stop()
  }
}

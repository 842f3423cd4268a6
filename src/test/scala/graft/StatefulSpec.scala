package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{MouseStream, StatefulOps}
import graft.streaming.StatefulOps.{PositionedEvent, ResolvedEvent}

/** Stateful streaming semantics: LOCF state across micro-batches,
  * checkpoint recovery (SURVEY T5/T7), keyed JSON sink shape (S4). */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("streaming LOCF carries position across micro-batches; leading sentinels drop") {
    val input = MemoryStream[PositionedEvent](spark)
    val q = StatefulOps.locfResolve(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("locf_out").start()
    try {
      // batch 1: leading sentinel (dropped), then a real position
      input.addData(
        PositionedEvent("u1", 0, 0, 1000),
        PositionedEvent("u1", 5, 6, 2000))
      q.processAllAvailable()
      // batch 2: sentinel only — must resolve via state from batch 1
      input.addData(PositionedEvent("u1", 0, 0, 3000))
      q.processAllAvailable()
      val rows = spark.table("locf_out").orderBy("time")
        .as[ResolvedEvent].collect()
      assert(rows.toSeq == Seq(
        ResolvedEvent("u1", 5, 6, 2000, carried = false),
        ResolvedEvent("u1", 5, 6, 3000, carried = true)))
    } finally q.stop()
  }

  test("locfResolve TTL evicts idle keys: state stays bounded under key churn") {
    val input = MemoryStream[PositionedEvent](spark)
    // NOTE: with ProcessingTimeTimeout the operator always requests
    // another batch (it cannot know when the next timer fires), so
    // processAllAvailable never observes quiescence — synchronize on
    // the SINK's contents instead, with a bounded trigger cadence.
    val q = StatefulOps.locfResolve(input.toDS(), stateTtlMs = 2000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("locf_ttl")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def await(cond: => Boolean, msg: String): Unit = {
      val deadline = System.currentTimeMillis() + 120000L
      while (!cond) {
        assert(q.exception.isEmpty, s"query died: ${q.exception}")
        assert(System.currentTimeMillis() < deadline, s"timed out: $msg")
        Thread.sleep(100L)
      }
    }
    try {
      // churn fixture: every batch brings 50 NEVER-RETURNING keys —
      // the access pattern that makes unbounded keyed state the first
      // OOM at 100× keys
      for (b <- 0 until 5) {
        input.addData((1 to 50).map(i =>
          PositionedEvent(s"u${b}_$i", b + 1, i, b * 1000L + i)): _*)
      }
      await(spark.table("locf_ttl").count() == 250L,
        "every churned event emitted exactly once")
      def stateRows: Long = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal).getOrElse(0L)
      assert(stateRows > 0L, s"churned keys must hold state: $stateRows")
      // let every key idle past the TTL: the timer batches running on
      // the trigger cadence must REMOVE the idle keys
      Thread.sleep(3000L)
      await(stateRows <= 5L,
        s"evicted state must track the live working set, not history")
      // post-eviction semantics are the documented ones: a returning
      // key is as-if never seen, so its leading sentinel drops (the
      // trailing real event proves the sentinel's batch was processed)
      input.addData(PositionedEvent("u0_1", 0, 0, 1000000L))
      input.addData(PositionedEvent("u0_1", 7, 7, 1000001L))
      await(spark.table("locf_ttl")
        .filter(col("user_id") === "u0_1" && col("time") === 1000001L)
        .count() == 1L, "post-eviction real event delivered")
      assert(spark.table("locf_ttl")
        .filter(col("user_id") === "u0_1" && col("time") === 1000000L)
        .isEmpty,
        "a sentinel after eviction must not resolve against evicted state")
    } finally q.stop()
  }

  test("transformWithState LOCF matches the flatMapGroupsWithState semantics") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[PositionedEvent](spark)
    val q = StatefulOps.locfResolveTws(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("locf_tws").start()
    try {
      input.addData(
        PositionedEvent("u1", 0, 0, 1000), // leading sentinel: dropped
        PositionedEvent("u1", 5, 6, 2000))
      q.processAllAvailable()
      input.addData(PositionedEvent("u1", 0, 0, 3000)) // cross-batch carry
      q.processAllAvailable()
      val rows = spark.table("locf_tws").orderBy("time")
        .as[ResolvedEvent].collect()
      assert(rows.toSeq == Seq(
        ResolvedEvent("u1", 5, 6, 2000, carried = false),
        ResolvedEvent("u1", 5, 6, 3000, carried = true)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsert sink state survives a query restart from checkpoint (T5/T7, S6)") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[String](spark)
    // driver-side keyed table standing in for the DynamoDB upsert target
    val table = new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()
    def start() = MouseStream.startToUpsert(
      spark, MouseStream.parse(input.toDF()), ckpt) { batch =>
      batch.collect().foreach { r =>
        table.put((r.getAs[String]("user_id"), r.getAs[Long]("sec")),
          r.getAs[Long]("cnt"))
      }
    }

    val q1 = start()
    input.addData(
      """{"user_id":"u1","x":1,"y":1,"time":100100}""",
      """{"user_id":"u1","x":2,"y":2,"time":100200}""",
      """{"user_id":"u1","x":3,"y":3,"time":100300}""")
    q1.processAllAvailable()
    q1.stop()
    assert(table.get(("u1", 100L)) == 3L)

    val q2 = start()
    try {
      input.addData(
        """{"user_id":"u1","x":4,"y":4,"time":100400}""",
        """{"user_id":"u1","x":5,"y":5,"time":100500}""")
      q2.processAllAvailable()
      // the upserted window count must include the pre-restart events
      assert(table.get(("u1", 100L)) == 5L)
    } finally q2.stop()
  }

  test("heartbeat fn emits the sentinel on timeout and passes events through (S3)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // normal batch: events pass through, state records the last time
    val s1 = TestGroupState.create[StatefulOps.HeartbeatState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty(), false)
    val out1 = StatefulOps.heartbeatFn(1000L)("u1",
      Iterator(StatefulOps.PositionedEvent("u1", 3, 4, 500)), s1).toSeq
    assert(out1.map(_.x) == Seq(3))
    assert(s1.get == StatefulOps.HeartbeatState(500L))
    assert(s1.getTimeoutTimestampMs.isPresent) // timeout armed

    // timed-out batch: sentinel emitted at current processing time
    val s2 = TestGroupState.create[StatefulOps.HeartbeatState](
      Optional.of(StatefulOps.HeartbeatState(500L)),
      GroupStateTimeout.ProcessingTimeTimeout, 2000L, Optional.empty(), true)
    val out2 = StatefulOps.heartbeatFn(1000L)("u1", Iterator.empty, s2).toSeq
    assert(out2 == Seq(StatefulOps.PositionedEvent("u1", 0, 0, 2000L)))
  }

  test("windowed aggregation runs on the RocksDB state store (production posture)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[String](spark)
    val q = MouseStream.startToMemory(spark,
      MouseStream.parse(input.toDF()), "rocksdb_t")
    try {
      input.addData(
        """{"user_id":"u1","x":1,"y":1,"time":700100}""",
        """{"user_id":"u1","x":2,"y":2,"time":700200}""")
      q.processAllAvailable()
      input.addData("""{"user_id":"u1","x":3,"y":3,"time":700300}""")
      q.processAllAvailable()
      val cnt = MouseStream.range(spark, "rocksdb_t", "u1", 0L)
        .filter(col("sec") === 700L).collect()(0).getAs[Long]("cnt")
      assert(cnt == 3L)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming signature dedup keeps first of a near-dup class, passes distinct docs") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingDedup
      .uniqueBySignature(docs, lateness = "1 hour")
      .select("doc_id")
      .writeStream.format("memory").outputMode("append")
      .queryName("sdedup_t").start()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    def t(ms: Long) = new java.sql.Timestamp(ms)
    try {
      input.addData((1L, base, t(1000)), (2L, "completely different words " +
        "about spark streaming state management", t(1100)))
      q.processAllAvailable()
      // batch 2: doc 3 repeats doc 1's text (same signature) -> suppressed;
      // doc 4 is short (no shingles) -> passes through
      input.addData((3L, base, t(2000)), (4L, "tiny doc", t(2100)))
      q.processAllAvailable()
      val kept = spark.table("sdedup_t").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 4L), s"kept $kept")
    } finally q.stop()
  }

  test("streaming LSH candidate pairs pair later arrivals with the bucket spine") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingDedup
      .candidatePairs(docs, lateness = "1 hour")
      .writeStream.format("memory").outputMode("append")
      .queryName("spairs_t").start()
    val base = "one two three four five six seven eight nine ten eleven"
    def t(ms: Long) = new java.sql.Timestamp(ms)
    try {
      input.addData((10L, base, t(1000)),
        (20L, "unrelated corpus text that shares no shingles at all here", t(1001)))
      q.processAllAvailable()
      input.addData((30L, base, t(2000))) // collides with doc 10 across batches
      q.processAllAvailable()
      val pairs = spark.table("spairs_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every pair anchors on the spine (10), one per colliding band
      assert(pairs == Set((10L, 30L)), s"pairs $pairs")
      val bands = spark.table("spairs_t").collect().map(_.getInt(2)).toSet
      assert(bands.subsetOf((0 until graft.dedup.Dedup.NumBands).toSet))
    } finally q.stop()
  }

  test("streaming candidates verify exactly per micro-batch (the routed front door)") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    // the ingest's document store: every doc seen so far (here a plain
    // map kept by the test; production keeps a parquet/Delta store)
    val store = scala.collection.concurrent.TrieMap.empty[Long, String]
    val verified = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    val q = graft.streaming.StreamingDedup
      .candidatePairs(docs, lateness = "1 hour")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val texts = store.toSeq.toDF("doc_id", "text")
        verified.synchronized {
          verified ++= graft.dedup.Dedup.verifyPairs(batch, texts)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1),
              r.getAs[Double]("jaccard")))
        }
        ()
      }.start()
    val base = "one two three four five six seven eight nine ten eleven"
    def t(ms: Long) = new java.sql.Timestamp(ms)
    try {
      store ++= Seq(10L -> base,
        20L -> "unrelated corpus text that shares no shingles at all here")
      input.addData((10L, base, t(1000)),
        (20L, "unrelated corpus text that shares no shingles at all here", t(1001)))
      q.processAllAvailable()
      // an exact repeat and a sub-threshold variant both collide on
      // bands; only the true near-dup survives exact verification
      store ++= Seq(30L -> base,
        40L -> ("one two three four " +
          "totally different tail content now following here instead"))
      input.addData((30L, base, t(2000)),
        (40L, "one two three four totally different tail content now " +
          "following here instead", t(2001)))
      q.processAllAvailable()
      val got = verified.synchronized(verified.toSet)
      assert(got.map(p => (p._1, p._2)).contains((10L, 30L)), s"got $got")
      assert(got.forall(_._3 >= 0.5), s"sub-threshold pair leaked: $got")
      assert(!got.exists(p => p._1 == 40L || p._2 == 40L),
        s"band coincidence rejected without exact evidence: $got")
    } finally q.stop()
  }

  test("keyed JSON sink shape round-trips through the wire format (S4)") {
    val events = MouseStream.parse(Seq(
      """{"user_id":"u7","x":11,"y":22,"time":5000}""").toDF("value"))
    val keyed = StatefulOps.toKeyedJson(events).collect()(0)
    assert(keyed.getAs[String]("key") == "u7")
    val back = MouseStream.parse(Seq(keyed.getAs[String]("value")).toDF("value"))
      .collect()(0)
    assert(back.getAs[Int]("x") == 11 && back.getAs[Long]("time") == 5000L)
  }
}

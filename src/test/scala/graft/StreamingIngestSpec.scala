package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CorpusIngest

/** The streaming corpus front door: PII masking, quality gates and
  * watermarked near-dup suppression composed in one pass. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new java.sql.Timestamp(ms)

  private val good =
    "contact alice@example.com for the full dataset description and license terms"
  private val distinctDoc =
    "streaming ingestion composes masking gating and dedup in a single pass"

  test("ingest admits clean docs, masks PII, suppresses dup signatures") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = CorpusIngest.ingest(docs, lateness = "1 hour")
      .writeStream.format("memory").outputMode(OutputMode.Append)
      .queryName("ingest_t").start()
    try {
      input.addData(
        (1L, t(1000), good),
        (3L, t(1100), "tiny doc"),                       // too_short
        (4L, t(1200), "spam spam spam spam spam spam spam spam")) // low diversity
      q.processAllAvailable()
      // batch 2: doc 2 repeats doc 1's text -> same signature, suppressed;
      // doc 5 is new -> admitted
      input.addData((2L, t(2000), good), (5L, t(2100), distinctDoc))
      q.processAllAvailable()
      val rows = spark.table("ingest_t").collect()
      val kept = rows.map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 5L), s"kept $kept")
      val tx1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
        .getAs[String]("text")
      assert(tx1.contains("<EMAIL>") && !tx1.contains("alice@"),
        s"PII must be masked in the admitted text: $tx1")
      assert(rows.find(_.getAs[Long]("doc_id") == 1L).get
        .getAs[Int]("n_pii") == 1)
    } finally q.stop()
  }

  test("capstone: documents stream from the V2 connector through ingest") {
    // the full training-data front door on the wire: producer →
    // kinesis-sim V2 source → JSON parse → mask/gate/dedup → store
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ingest_wire").toString
    val prod = new graft.sources.SimulatedKinesis.ShardedProducer(dir, 2)
    def rec(id: Long, ts: Long, text: String): (String, String) =
      (s"""{"doc_id":$id,"ts":$ts,"text":"$text"}""", s"src-${id % 2}")
    prod.putRecords(Seq(
      rec(1L, 1000L, good),
      rec(2L, 1100L, good),          // dup of 1 -> suppressed
      rec(3L, 1200L, "tiny doc"),    // rejected at the gate
      rec(4L, 1300L, distinctDoc)))
    val schema = "doc_id LONG, ts LONG, text STRING"
    val docs = spark.readStream.format("kinesis-sim")
      .option("path", dir).option("shards", "2").load()
      .select(from_json(col("data").cast("string"), schema,
        Map.empty[String, String]).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        timestamp_millis(col("d.ts")).as("ts"), col("d.text").as("text"))
    val q = CorpusIngest.ingest(docs, lateness = "1 hour")
      .writeStream.format("memory").outputMode(OutputMode.Append)
      .queryName("ingest_wire").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("ingest_wire").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      // docs 1 and 2 are signature-identical and arrive in the same
      // micro-batch: exactly ONE survives (which one is partition
      // order, not a contract); 3 fails the gate; 4 is admitted
      assert(kept.intersect(Set(1L, 2L)).size == 1 && kept.contains(4L)
          && !kept.contains(3L) && kept.size == 2,
        s"kept $kept")
    } finally q.stop()
  }

  test("frozen-LM perplexity gate scores micro-batches in foreachBatch") {
    // CCNet deployment shape: train the bigram LM on the existing
    // corpus ONCE, then every arriving micro-batch is scored against
    // the frozen counts — unseen transitions fall to the smoothing
    // floor and fail the gate
    import graft.text.TextAnalysis
    val corpus = Seq(
      (100L, good), (101L, good), (102L, distinctDoc))
      .toDF("doc_id", "text")
    val model = TextAnalysis.trainLm(corpus)
    val seen = collection.mutable.Map.empty[Long, (Boolean, String)]
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = input.toDF().toDF("doc_id", "ts", "text")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CorpusIngest.lmGate(batch, model, maxAvgNll = 2.0).collect()
          .foreach(r => seen(r.getAs[Long]("doc_id")) =
            (r.getAs[Boolean]("keep"), r.getAs[String]("reason")))
      }.start()
    try {
      input.addData(
        (1L, t(1000), good),                       // in-distribution
        (2L, t(1100), "zq xv qqk vxz blorp wuggle"), // unseen everything
        (3L, t(1200), "solo"))                     // no bigram evidence
      q.processAllAvailable()
      assert(seen(1L)._1, s"in-distribution doc must pass: ${seen(1L)}")
      assert(!seen(2L)._1 && seen(2L)._2 == "high_perplexity")
      assert(!seen(3L)._1 && seen(3L)._2 == "high_perplexity")
    } finally q.stop()
  }

  test("ingestWithLm: wire -> V2 source -> PII -> gates -> dedup -> lmGate -> store") {
    // the capstone as ONE product-code call: a frozen LM trained on a
    // seed corpus gates what the masked/gated/deduped stream admits
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    // train on the MASKED corpus — what the store actually holds
    // (ingest admits masked text, so the LM must score masked text;
    // training on raw PII-bearing text would make its own corpus
    // look out-of-distribution at scoring time)
    val seed = Seq((100L, good), (101L, good), (102L, distinctDoc))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("text"))
    val model = TextAnalysis.trainLm(seed)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ingest_lm_wire").toString
    val prod = new graft.sources.SimulatedKinesis.ShardedProducer(dir, 2)
    def rec(id: Long, ts: Long, text: String): (String, String) =
      (s"""{"doc_id":$id,"ts":$ts,"text":"$text"}""", s"src-${id % 2}")
    prod.putRecords(Seq(
      rec(1L, 1000L, good),          // in-distribution -> admitted
      rec(2L, 1100L, good),          // dup signature -> suppressed pre-LM
      rec(3L, 1200L, "tiny doc"),    // gate reject, never reaches the LM
      rec(4L, 1300L,
        "blorp wuggle zq xv qqk vxz snark fnord grue zorp")))
      // ^ passes length/diversity but every transition is unseen ->
      //   LM floor -> high_perplexity
    val schema = "doc_id LONG, ts LONG, text STRING"
    val docs = spark.readStream.format("kinesis-sim")
      .option("path", dir).option("shards", "2").load()
      .select(from_json(col("data").cast("string"), schema,
        Map.empty[String, String]).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        timestamp_millis(col("d.ts")).as("ts"), col("d.text").as("text"))
    val stored = collection.mutable.Map.empty[Long, (Boolean, String)]
    val q = CorpusIngest.ingestWithLm(docs, model, maxAvgNll = 2.0,
      store = (gated, _) => stored.synchronized {
        gated.collect().foreach(r => stored(r.getAs[Long]("doc_id")) =
          (r.getAs[Boolean]("keep"), r.getAs[String]("reason")))
      },
      lateness = "1 hour")
    try {
      q.processAllAvailable()
      // exactly one of {1,2} survives the signature dedup; it passes
      // the LM; 3 never reaches the store; 4 reaches it but fails
      val dupSurvivor = stored.keySet.intersect(Set(1L, 2L))
      assert(dupSurvivor.size == 1, s"stored ${stored.keySet}")
      assert(stored(dupSurvivor.head)._1, s"in-distribution doc must pass")
      assert(!stored.contains(3L), "gate reject must never reach the LM store")
      assert(stored.get(4L).exists(v => !v._1 && v._2 == "high_perplexity"),
        s"vocabulary-foreign doc must fail the LM gate: ${stored.get(4L)}")
    } finally q.stop()
  }

  test("verifiedIngest: in-flight candidates verify exactly, store pruned to the slice") {
    // the StatefulSpec composition promoted to product code: one call
    // wires candidatePairs -> verifyPairs in foreachBatch
    val store = scala.collection.concurrent.TrieMap.empty[Long, String]
    val verified = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val base = "one two three four five six seven eight nine ten eleven"
    val q = CorpusIngest.verifiedIngest(docs,
      store = () => store.toSeq.toDF("doc_id", "text"),
      onVerified = (pairs, _) => verified.synchronized {
        verified ++= pairs.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
      },
      lateness = "1 hour")
    try {
      store ++= Seq(10L -> base, 30L -> base)
      input.addData((10L, base, t(1000)))
      q.processAllAvailable()
      input.addData((30L, base, t(2000))) // exact repeat -> verified dup
      q.processAllAvailable()
      val got = verified.synchronized(verified.toList)
      assert(got.exists(p => Set(p._1, p._2) == Set(10L, 30L) && p._3 == 1.0),
        s"exact repeat must verify at jaccard 1.0: $got")
    } finally q.stop()
    // the scale contract: verification tokenizes ONLY docs appearing
    // in some candidate pair — the store joins in via LEFT SEMI before
    // any shingle work (candidate-slice pruning: plan- AND row-asserted
    // on the seam itself; the shingle relation's eager checkpoint hides
    // the join from downstream plans)
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val cand = Seq((10L, 30L)).toDF("id1", "id2")
    store += 99L -> "an uninvolved document that must never be tokenized"
    val texts = store.toSeq.toDF("doc_id", "text")
    val pruned = graft.dedup.Dedup.involvedTexts(cand, texts)
    val plan = pruned.queryExecution.optimizedPlan
    assert(plan.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      s"verifyPairs must left-semi-prune the store to the candidate slice:\n$plan")
    assert(pruned.select("doc_id").as[Long].collect().toSet == Set(10L, 30L),
      "only candidate-pair docs may reach the shingle stage")
  }

  test("grand capstone: HTTP wire -> capped V2 source -> full front door -> store") {
    // every round-7 piece in ONE running pipeline over a real socket:
    // records PRODUCED over HTTP (server-assigned sequences), consumed
    // through the V2 connector's endpoint option under admission
    // control, masked/gated/deduped, scored by the frozen LM, stored
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    import graft.sources.ShardService
    val seed = Seq((100L, good), (101L, good), (102L, distinctDoc))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("text"))
    val model = TextAnalysis.trainLm(seed)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_grand_capstone").toString
    val server = ShardService.start(dir, nShards = 2)
    val ep = s"http://127.0.0.1:${server.getAddress.getPort}"
    def rec(id: Long, ts: Long, text: String): (String, String) =
      (s"""{"doc_id":$id,"ts":$ts,"text":"$text"}""", s"src-${id % 2}")
    // produce THROUGH the socket, idempotency-keyed like a real client
    ShardService.Client.putRecords(ep, Seq(
      rec(1L, 1000L, good),          // admitted
      rec(2L, 1100L, good),          // dup signature -> suppressed
      rec(3L, 1200L, "tiny doc"),    // gate reject
      rec(4L, 1300L,
        "blorp wuggle zq xv qqk vxz snark fnord grue zorp")), // LM reject
      idempotencyKey = Some("capstone-flush-1"))
    val schema = "doc_id LONG, ts LONG, text STRING"
    val docs = spark.readStream.format("kinesis-sim")
      .option("endpoint", ep).option("shards", "2")
      .option("maxRecordsPerTrigger", "2").load()
      .select(from_json(col("data").cast("string"), schema,
        Map.empty[String, String]).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        timestamp_millis(col("d.ts")).as("ts"), col("d.text").as("text"))
    val stored = collection.mutable.Map.empty[Long, (Boolean, String)]
    val q = CorpusIngest.ingestWithLm(docs, model, maxAvgNll = 2.0,
      store = (gated, _) => stored.synchronized {
        gated.collect().foreach(r => stored(r.getAs[Long]("doc_id")) =
          (r.getAs[Boolean]("keep"), r.getAs[String]("reason")))
      },
      lateness = "1 hour")
    try {
      q.processAllAvailable()
      val dupSurvivor = stored.keySet.intersect(Set(1L, 2L))
      assert(dupSurvivor.size == 1 && stored(dupSurvivor.head)._1,
        s"one of the dup pair survives and passes: $stored")
      assert(!stored.contains(3L), "gate reject never reaches the store")
      assert(stored.get(4L).exists(v => !v._1 && v._2 == "high_perplexity"),
        s"vocabulary-foreign doc fails the LM: ${stored.get(4L)}")
    } finally { q.stop(); server.stop(0) }
  }

  test("ingestWithLm restarts from checkpoint: pre-restart batches are not re-stored") {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ingest_lm_ckpt").toString
    val seed = Seq((100L, good), (101L, good), (102L, distinctDoc))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("text"))
    val model = TextAnalysis.trainLm(seed)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    // count every delivery per doc: exactly-once means each admitted
    // doc reaches the store exactly once ACROSS the restart
    val deliveries = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val sumFn = new java.util.function.BiFunction[Integer, Integer, Integer] {
      def apply(a: Integer, b: Integer): Integer = a + b
    }
    def start() = CorpusIngest.ingestWithLm(docs, model, maxAvgNll = 2.0,
      store = (gated, _) => gated.collect().foreach { r =>
        deliveries.merge(r.getAs[Long]("doc_id"), 1, sumFn)
      },
      lateness = "1 hour", checkpointDir = Some(ckpt))
    val q1 = start()
    input.addData((1L, t(1000), good))
    q1.processAllAvailable()
    q1.stop()
    assert(deliveries.get(1L) == 1, s"doc 1 once pre-restart: $deliveries")
    val q2 = start()
    try {
      input.addData((5L, t(2000), distinctDoc))
      q2.processAllAvailable()
      assert(deliveries.get(5L) == 1, s"doc 5 once post-restart: $deliveries")
      assert(deliveries.get(1L) == 1,
        s"restart must not replay committed batches: $deliveries")
    } finally q2.stop()
  }

  test("composed front door: ingest -> streaming dedup -> IVF append " +
       "on ONE stream survives a mid-stream restart and equals the " +
       "batch recompute") {
    // VERDICT r10 item 6: the pieces (CorpusIngest, StreamingDedup,
    // IvfIndex append) composed end-to-end on one MemoryStream, the
    // query killed and restarted mid-stream from its checkpoint, and
    // BOTH live artifacts — the admitted doc set and the IVF index
    // contents — checked against a from-scratch batch recompute.
    import org.apache.spark.sql.functions._
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_frontdoor_ivf").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_frontdoor_ckpt").toString
    // base index: the two-blob fixture (ids 0..99); streamed docs
    // land as vec_id = 1000 + doc_id, high blob for odd ids
    def jit(id: Long, d: Int): Float = ((id * 31 + d * 7) % 10) / 10.0f
    val blobs = (0L until 100L).map { id =>
      val base = if (id < 50) 0.0f else 10.0f
      (id, Array.tabulate(4)(d => base + jit(id, d)))
    }.toDF("vec_id", "embedding")
    graft.similarity.IvfIndex.build(blobs, ivfDir, k = 2, iters = 4)
    val thirdDoc =
      "vector indexes append admitted documents under checkpointed state"
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val deliveries = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val sumFn = new java.util.function.BiFunction[Integer, Integer, Integer] {
      def apply(a: Integer, b: Integer): Integer = a + b
    }
    // deterministic embedding derived from the admitted doc row — the
    // decode stub convention: the Spark-side plumbing (schema, append
    // path, cell assignment) is real
    def embed(batch: org.apache.spark.sql.DataFrame) = batch.select(
      (col("doc_id") + 1000L).as("vec_id"),
      expr("""transform(sequence(0, 3), d -> cast(
               cast((doc_id % 2) * 10 as double) +
               cast((doc_id * 31 + d * 7) % 10 as double) / 10.0
             as float))""").as("embedding"))
    def start() = CorpusIngest.ingest(docs, lateness = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        b.collect().foreach(r =>
          deliveries.merge(r.getAs[Long]("doc_id"), 1, sumFn))
        graft.similarity.IvfIndex.append(spark, ivfDir, embed(b))
        b.unpersist()
        ()
      }.start()
    val q1 = start()
    input.addData(
      (1L, t(1000), good),        // admitted
      (2L, t(1100), "tiny doc"),  // rejected at the gate
      (3L, t(1200), distinctDoc)) // admitted
    q1.processAllAvailable()
    q1.stop() // mid-stream kill
    val q2 = start()
    try {
      input.addData(
        (4L, t(2000), good),      // same signature as doc 1, ACROSS
                                  // the restart -> recovered dedup
                                  // state must suppress it
        (5L, t(2100), thirdDoc))  // admitted
      q2.processAllAvailable()
    } finally q2.stop()
    // batch recompute on the same five documents: annotate + gate,
    // then first-arrival-per-signature (arrival order == doc_id order
    // here), the exact uniqueBySignature key construction
    val allDocs = Seq((1L, t(1000), good), (2L, t(1100), "tiny doc"),
        (3L, t(1200), distinctDoc), (4L, t(2000), good),
        (5L, t(2100), thirdDoc))
      .toDF("doc_id", "ts", "text")
    val batchAdmitted = CorpusIngest.annotate(allDocs)
      .filter(col("keep"))
      .withColumn("dedup_key", coalesce(
        md5(concat_ws("|", call_function("graft_minhash",
          graft.functions.Portable.tokens(col("text"))))),
        concat(lit("short:"), col("doc_id"))))
      .groupBy(col("dedup_key")).agg(min(col("doc_id")).as("doc_id"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(batchAdmitted == Set(1L, 3L, 5L), s"fixture: $batchAdmitted")
    // 1) admitted set across the restart == batch recompute, each
    //    delivered exactly once (no replay of committed batches)
    import scala.jdk.CollectionConverters._
    val streamed = deliveries.keySet.asScala.toSet
    assert(streamed == batchAdmitted,
      s"streaming admitted $streamed != batch $batchAdmitted")
    assert(deliveries.values.asScala.forall(_ == 1),
      s"every admitted doc exactly once across the restart: $deliveries")
    // 2) index contents == base vectors + exactly the admitted docs
    val stored = spark.read.parquet(s"$ivfDir/vectors.parquet")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n")).collect()
    assert(stored.map(_.getLong(0)).toSet ==
      (0L until 100L).toSet ++ batchAdmitted.map(_ + 1000L),
      "index must hold base + admitted, nothing else")
    assert(stored.forall(_.getLong(1) == 1L),
      "restart must not double-append any vector")
    // 3) the index still serves: all streamed docs are odd ids ->
    //    high blob; a high-blob probe must surface every one
    val res = graft.similarity.IvfIndex.probe(spark, ivfDir,
        Seq((9000L, Array.fill(4)(10.5f))).toDF("qid", "qvec"),
        k = 60, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(batchAdmitted.map(_ + 1000L).subsetOf(res),
      s"probe must see every admitted vector: $res")
  }

  test("composed front door + maintenance: publishRebuild under a " +
       "pinned probe while the admission query lives; post-rebuild " +
       "index == from-scratch recompute") {
    // VERDICT r11 item 5: the last seam between the streaming and
    // maintenance halves of the ANN story. The front door appends
    // into a SNAPSHOT-VERSIONED index root; mid-stream (after a
    // restart) a rebuild publishes the next generation while a
    // pinned probe keeps reading the old one; admission then
    // continues into the NEW generation. Appends and the rebuild are
    // serialized per the writer-writer contract (the rebuild runs
    // between micro-batches of the LIVE query); the racing-append
    // abort itself is covered in KmeansSpec.
    import org.apache.spark.sql.functions._
    import graft.similarity.IvfIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft_frontdoor_vroot").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_frontdoor_vckpt").toString
    def jit(id: Long, d: Int): Float = ((id * 31 + d * 7) % 10) / 10.0f
    val blobs = (0L until 100L).map { id =>
      val base = if (id < 50) 0.0f else 10.0f
      (id, Array.tabulate(4)(d => base + jit(id, d)))
    }.toDF("vec_id", "embedding")
    IvfIndex.publishBuild(blobs, dir, k = 2, iters = 4)
    val thirdDoc =
      "vector indexes append admitted documents under checkpointed state"
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    def embed(batch: org.apache.spark.sql.DataFrame) = batch.select(
      (col("doc_id") + 1000L).as("vec_id"),
      expr("""transform(sequence(0, 3), d -> cast(
               cast((doc_id % 2) * 10 as double) +
               cast((doc_id * 31 + d * 7) % 10 as double) / 10.0
             as float))""").as("embedding"))
    def start() = CorpusIngest.ingest(docs, lateness = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // resolve the pointer per micro-batch: post-rebuild batches
        // land in the new generation automatically
        IvfIndex.append(spark, IvfIndex.currentRoot(dir), embed(batch))
      }.start()
    val q1 = start()
    input.addData((1L, t(1000), good), (2L, t(1100), "tiny doc"),
      (3L, t(1200), distinctDoc))
    q1.processAllAvailable()
    q1.stop() // mid-stream kill, as in the r11 composed spec
    val q2 = start()
    try {
      // an in-flight reader pins the PRE-rebuild generation
      val pinned = IvfIndex.currentRoot(dir)
      IvfIndex.publishRebuild(spark, dir, k = 2, iters = 4)
      assert(IvfIndex.currentRoot(dir) != pinned, "pointer swapped")
      // admission CONTINUES into the new generation
      input.addData(
        (4L, t(2000), good),      // dup of 1 across restart+rebuild
        (5L, t(2100), thirdDoc))  // admitted post-rebuild
      q2.processAllAvailable()
      val hi = Seq((9000L, Array.fill(4)(10.5f))).toDF("qid", "qvec")
      // 1) the pinned probe serves the OLD generation exactly: the
      //    pre-rebuild appends, not the post-rebuild one
      val pinnedIds = IvfIndex.probe(spark, pinned, hi,
        k = 200, nprobe = 2).collect().map(_.getLong(2)).toSet
      assert(Set(1001L, 1003L).subsetOf(pinnedIds) &&
        !pinnedIds.contains(1005L),
        s"snapshot isolation under rebuild: $pinnedIds")
      // 2) the current index equals a FROM-SCRATCH recompute over
      //    base + every admitted vector: with nprobe = all cells the
      //    probe is exact, so identical stored sets must rank
      //    identically whatever the two trainings' centroids did
      val refDir = java.nio.file.Files
        .createTempDirectory("graft_frontdoor_ref").toString
      IvfIndex.publishBuild(
        blobs.unionByName(embed(Seq(
          (1L, t(1000), good), (3L, t(1200), distinctDoc),
          (5L, t(2100), thirdDoc)).toDF("doc_id", "ts", "text"))),
        refDir, k = 2, iters = 4)
      def rowsOf(root: String) = IvfIndex.probe(spark, root, hi,
          k = 200, nprobe = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(rowsOf(IvfIndex.currentRoot(dir)) ==
        rowsOf(IvfIndex.currentRoot(refDir)),
        "post-rebuild probe must equal the batch recompute's index")
      // 3) nothing double-appended across restart + rebuild
      val stored = spark.read
        .parquet(s"${IvfIndex.currentRoot(dir)}/vectors.parquet")
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n")).collect()
      assert(stored.map(_.getLong(0)).toSet ==
        (0L until 100L).toSet ++ Set(1001L, 1003L, 1005L) &&
        stored.forall(_.getLong(1) == 1L),
        "rebuild + append must preserve exactly base + admitted")
    } finally q2.stop()
  }

  test("media admission: exact-signature dedup per media type, state " +
       "survives a restart, small objects pass through") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingDedup
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_media_ckpt").toString
    val payloadA = "a long enough media payload with plenty of " +
      "stable shingle mass for the perceptual signature to vote on"
    val payloadB = "completely different bytes with no shared " +
      "shingles anywhere in this other payload at all ok"
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)](spark)
    val media = input.toDF().toDF("doc_id", "media_type", "txt", "ts")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"), col("ts"))
    val deliveries = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val sumFn = new java.util.function.BiFunction[Integer, Integer, Integer] {
      def apply(a: Integer, b: Integer): Integer = a + b
    }
    def start() = StreamingDedup
      .uniqueMediaBySignature(media, lateness = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          deliveries.merge(r.getAs[Long]("doc_id"), 1, sumFn)
        }
      }.start()
    val q1 = start()
    input.addData(
      (1L, "image/png", payloadA, t(1000)),
      (2L, "audio/wav", payloadA, t(1100)),  // same bytes, other type
      (3L, "image/png", payloadA, t(1200)),  // dup of 1 -> suppressed
      (6L, "image/png", "ab", t(1300)),      // too small to shingle
      (7L, "image/png", "ab", t(1400)))      // also passes (no evidence)
    q1.processAllAvailable()
    q1.stop()
    assert(deliveries.keySet().asInstanceOf[java.util.Set[Long]]
      .containsAll(java.util.Arrays.asList(1L, 2L, 6L, 7L)) &&
      !deliveries.containsKey(3L),
      s"type isolation + suppression + small pass-through: $deliveries")
    val q2 = start()
    try {
      input.addData(
        (4L, "image/png", payloadA, t(2000)), // dup of 1, RECOVERED state
        (5L, "image/png", payloadB, t(2100))) // genuinely new
      q2.processAllAvailable()
      assert(!deliveries.containsKey(4L),
        s"recovered signature state must suppress the post-restart dup: $deliveries")
      assert(deliveries.get(5L) == 1 && deliveries.get(1L) == 1,
        s"new object admitted once, committed batches not replayed: $deliveries")
    } finally q2.stop()
  }

  test("media band-level candidate stream: near-dups emit (spine, doc) " +
       "pairs with both signatures + hamming, type-isolated, spine " +
       "state survives a restart, committed pairs not re-emitted") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingDedup
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_media_cand_ckpt").toString
    // the perceptual signature samples the FIRST nFrames×frameBytes
    // = 64 bytes; same prefix + different tails ⇒ identical 64-bit
    // signature (hamming 0, every band matches) — the deterministic
    // near-dup fixture
    val win = ("stable shingle mass for the perceptual signature " +
      "to vote on, padded").padTo(64, '#').take(64).mkString
    def payload(tail: String) = win + tail
    val other = "completely different bytes with no shared shingles " +
      "anywhere in this other payload at all ok"
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)](spark)
    val media = input.toDF().toDF("doc_id", "media_type", "txt", "ts")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"), col("ts"))
    val pairs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(String, Int, Long, Long, Long), java.lang.Boolean]())
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    def start() = StreamingDedup
      .mediaCandidatePairs(media, lateness = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          seen.incrementAndGet()
          pairs.add((r.getAs[String]("media_type"), r.getAs[Int]("band"),
            r.getAs[Long]("id1"), r.getAs[Long]("id2"),
            r.getAs[Long]("hamming")))
        }
      }.start()
    val q1 = start()
    input.addData(
      (1L, "image/png", payload("tail one"), t(1000)),   // spine
      (2L, "audio/wav", payload("tail one"), t(1100)),   // other type
      (6L, "image/png", "ab", t(1300)))                  // too small
    q1.processAllAvailable()
    input.addData(
      (3L, "image/png", payload("other tail"), t(1200))) // near-dup of 1
    q1.processAllAvailable()
    q1.stop()
    import scala.jdk.CollectionConverters._
    val afterB1 = pairs.asScala.toSet
    assert(afterB1 == (0 until 4).map(b =>
        ("image/png", b, 1L, 3L, 0L)).toSet,
      s"identical signature collides on all 4 bands, hamming 0, " +
        s"spine = first arrival; type-isolated; small object silent: $afterB1")
    val preRestartCount = seen.get()
    val q2 = start()
    try {
      input.addData(
        (4L, "image/png", payload("third tail"), t(2000)), // near-dup, recovered spine
        (5L, "image/png", other, t(2100)))                 // unrelated
      q2.processAllAvailable()
      val now = pairs.asScala.toSet
      assert((0 until 4).forall(b => now(("image/png", b, 1L, 4L, 0L))),
        s"recovered spine state pairs the post-restart near-dup with " +
          s"the ORIGINAL spine (1), never a re-elected one: $now")
      assert(!now.exists(p => p._3 == 3L || p._4 == 5L),
        s"no doc-3-spine pairs (spine is sticky), no unrelated pairs: $now")
      assert(seen.get() == preRestartCount + 4,
        s"committed pairs must not replay across the restart: " +
          s"${seen.get()} vs $preRestartCount + 4")
    } finally q2.stop()
  }

  test("media candidate RECALL CONTRACT: a far spine eats its band — " +
       "the true pair is not emitted there (documented miss); batch " +
       "re-banding is the backstop that still finds it") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingDedup
    val M = graft.multimodal.Multimodal
    def sigExpr(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("data", encode(col("txt"), "UTF-8"))
      .withColumn("sig", M.simhash64Of(M.shingleTokens("data", 16, 4, 4)))
    // the true near-dup pair: identical 64-byte signature window,
    // different tails — hamming 0, shares ALL four band buckets
    val w2 = ("true pair window the far spine must collide with on " +
      "exactly one band").padTo(64, '=').take(64).mkString
    val s2 = sigExpr(Seq(w2).toDF("txt")).select("sig").head().getString(0)
    // deterministic search for the far spine: a window whose
    // signature matches w2's on EXACTLY one 16-bit band (so it
    // spines exactly one shared bucket) while the full-signature
    // hamming exceeds the budget (so the verifier rejects every
    // spine-anchored pair from that bucket). Signatures are
    // deterministic, so the hit is stable across runs.
    val bandEq = (0 until 4).map(k =>
      (substring(col("sig"), k * 16 + 1, 16) ===
        lit(s2.substring(k * 16, k * 16 + 16))).cast("int"))
    // the WHOLE window must vary per candidate: a constant prefix +
    // padding would out-vote the few varying shingles and every
    // candidate would hash identically (measured: 120k identical
    // signatures) — so tile an id-derived string across all 64 bytes
    val hit = sigExpr(spark.range(120000)
        .select(substring(repeat(
          format_string("%010d#", col("id") * 7919L), 7), 1, 64).as("txt")))
      .withColumn("n_eq", bandEq.reduce(_ + _))
      .withColumn("h", expr(s"graft_hamming(sig, '$s2')"))
      .filter(col("n_eq") === 1 && col("h") > 3)
      .select(col("txt"), col("h"),
        array((0 until 4).map(k => bandEq(k)): _*).as("eq"))
      .head()
    val w1 = hit.getString(0)
    val farH = hit.getAs[Number](1).longValue
    val bandK = hit.getSeq[Int](2).indexOf(1)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_media_miss_ckpt").toString
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)](spark)
    val media = input.toDF().toDF("doc_id", "media_type", "txt", "ts")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"), col("ts"))
    val pairs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Int, Long, Long, Long), java.lang.Boolean]())
    val q = StreamingDedup.mediaCandidatePairs(media, lateness = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          pairs.add((r.getAs[Int]("band"), r.getAs[Long]("id1"),
            r.getAs[Long]("id2"), r.getAs[Number]("hamming").longValue))
        }
      }.start()
    try {
      // separate micro-batches pin spine election deterministically
      input.addData((1L, "image/png", w1, t(1000))); q.processAllAvailable()
      input.addData((2L, "image/png", w2 + " t2", t(1100))); q.processAllAvailable()
      input.addData((3L, "image/png", w2 + " t3", t(1200))); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = pairs.asScala.toSet
    val onBandK = got.filter(_._1 == bandK)
    // the documented miss: on the far-spined band the bucket holds
    // {1, 2, 3} and 2–3 are hamming 0 of each other, yet the only
    // emissions are the spine-anchored rejectable ones — the
    // verifier's budget filter leaves NOTHING from this band
    assert(onBandK == Set((bandK, 1L, 2L, farH), (bandK, 1L, 3L, farH)),
      s"band $bandK must emit exactly the far-spine pairs: $onBandK")
    assert(onBandK.forall(_._4 > 3L) && !got.exists(p =>
        p._2 == 2L && p._3 == 3L && p._1 == bandK),
      s"the true pair must NOT surface on the far-spined band: $got")
    // this fixture loses only ONE band — the pair still surfaces on
    // the three bands 2 spines itself; a d1 far-spining EVERY shared
    // band is the total-loss shape the Scaladoc contract warns about
    assert((0 until 4).filter(_ != bandK).forall(b =>
        got((b, 2L, 3L, 0L))), s"non-spined bands still emit 2-3: $got")
    // the stated backstop: batch re-banding over the admitted corpus
    // expands ALL pairs per bucket and finds 2-3 at hamming 0
    val batchPairs = M.nearBlocks(
        Seq((1L, "image/png", w1), (2L, "image/png", w2 + " t2"),
          (3L, "image/png", w2 + " t3")).toDF("doc_id", "media_type", "txt")
          .select(col("doc_id"), col("media_type"),
            encode(col("txt"), "UTF-8").as("data")))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batchPairs.contains((2L, 3L)),
      s"batch nearBlocks must recall the missed pair: ${batchPairs.toSeq}")
  }

  test("observed gate metrics ride the stream: n_in/n_kept/n_pii per batch") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = CorpusIngest.withGateMetrics(CorpusIngest.annotate(docs))
      .writeStream.format("noop").outputMode("append").start()
    try {
      input.addData(
        (1L, t(1000), good),      // kept, 1 PII span
        (2L, t(1100), "tiny doc"), // rejected
        (3L, t(1200), distinctDoc)) // kept, no PII
      q.processAllAvailable()
      val m = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("corpus_gate")))
        .lastOption.getOrElse(fail("no observed metrics surfaced"))
      assert(m.getAs[Long]("n_in") == 3L, s"$m")
      assert(m.getAs[Long]("n_kept") == 2L, s"$m")
      assert(m.getAs[Long]("n_pii") == 1L, s"$m")
    } finally q.stop()
  }

  test("live leakage monitor: per-batch chi2_ppm rides the stream " +
       "and equals the batch audit on each micro-batch") {
    import org.apache.spark.sql.functions.{col, sum}
    import graft.operators.Expectations
    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "source", "label")
    val q = CorpusIngest.withLeakageMetrics(docs,
        col("source"), col("label"))
      .writeStream.format("noop").outputMode("append").start()
    def lastMetric() = q.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("leakage_gate")))
      .lastOption.getOrElse(fail("no leakage metrics surfaced"))
    try {
      // batch 1: perfectly anti-associated — the leakage alarm
      val b1 = (1 to 20).map(i =>
        (i.toLong, t(1000 + i), s"src${i % 2}", s"pos${i % 2}"))
      input.addData(b1: _*)
      q.processAllAvailable()
      val m1 = lastMetric()
      val expect1 = Expectations.labelAssociation(
          b1.toDF("doc_id", "ts", "source", "label"), "source", "label")
        .agg(sum("contrib_ppm").cast("long")).head().getLong(0)
      assert(m1.getAs[Long]("chi2_ppm") == expect1 &&
        m1.getAs[Long]("n_assoc") == 20L,
        s"anti-associated batch must alarm exactly: $m1 vs $expect1")
      assert(expect1 > 0L, "fixture sanity: association present")
      // batch 2: label independent of source — reads ~zero
      val b2 = (1 to 24).map(i =>
        (100L + i, t(2000 + i), s"src${i % 2}", s"pos${(i / 2) % 2}"))
      input.addData(b2: _*)
      q.processAllAvailable()
      val m2 = lastMetric()
      val expect2 = Expectations.labelAssociation(
          b2.toDF("doc_id", "ts", "source", "label"), "source", "label")
        .agg(sum("contrib_ppm").cast("long")).head().getLong(0)
      assert(m2.getAs[Long]("chi2_ppm") == expect2,
        s"per-batch metric tracks the batch audit: $m2 vs $expect2")
    } finally q.stop()
  }

  test("parseTagged quarantines malformed wire records instead of dropping them") {
    import graft.streaming.MouseStream
    val input = MemoryStream[String](spark)
    val tagged = MouseStream.parseTagged(input.toDF())
    val q = tagged.writeStream.format("memory").outputMode("append")
      .queryName("parse_quarantine").start()
    try {
      input.addData(
        """{"user_id":"u1","x":1,"y":2,"time":5000}""",
        """this is not json at all""",
        """{"broken": true}""")
      q.processAllAvailable()
      val rows = spark.table("parse_quarantine").collect()
      assert(rows.length == 3, "every input record must survive, tagged")
      val (ok, bad) = rows.partition(_.getAs[Boolean]("valid"))
      assert(ok.length == 1 && ok.head.getAs[String]("user_id") == "u1")
      assert(ok.head.getAs[String]("raw") == null,
        "valid rows must not double-store the payload")
      assert(bad.length == 2 &&
        bad.map(_.getAs[String]("raw")).toSet ==
          Set("this is not json at all", """{"broken": true}"""),
        "quarantined rows must carry the raw wire payload for replay")
    } finally q.stop()
  }

  test("rejects carry the first failed gate as reason, PII already masked") {
    // annotate/rejects are stateless projections, so the reject path
    // is checked on a batch frame — identical semantics by construction
    val d = Seq(
      (1L, t(1000), good),
      (3L, t(1100), "tiny doc"),
      (4L, t(1200), "spam spam spam spam spam spam spam spam"),
      (6L, t(1300), "mail bob@example.org now")) // 4 tokens: short wins
      .toDF("doc_id", "ts", "text")
    val got = CorpusIngest.rejects(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("reason"),
        r.getAs[String]("text")))
    assert(got.map(x => (x._1, x._2)).toSeq == Seq(
      (3L, "too_short"), (4L, "low_diversity"), (6L, "too_short")))
    assert(got.find(_._1 == 6L).get._3.contains("<EMAIL>"),
      "reject stream must never carry raw PII")
  }
}

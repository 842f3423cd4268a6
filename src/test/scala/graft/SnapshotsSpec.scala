package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** The snapshot-pointer table protocol: write-then-swap publishes,
  * snapshot isolation for in-flight readers, compaction as a
  * snapshot, vacuum retention. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("publish swaps atomically; pinned readers keep their snapshot") {
    val dir = Files.createTempDirectory("graft_snap").toString
    val v1 = Snapshots.publish((1 to 10).toDF("n"), dir)
    assert(v1 == 1L && Snapshots.currentId(dir).contains(1L))
    // resolve a reader against v1 BEFORE the next publish
    val pinned = Snapshots.read(spark, dir)
    assert(pinned.count() == 10)
    val v2 = Snapshots.publish((1 to 25).toDF("n"), dir)
    assert(v2 == 2L)
    // new resolve sees v2; the pinned frame still reads v1's directory
    assert(Snapshots.read(spark, dir).count() == 25)
    assert(pinned.count() == 10,
      "snapshot isolation: a resolved reader must not see later publishes")
    // the pointer names exactly one live snapshot; both dirs exist
    assert(Snapshots.currentPath(dir).endsWith("snap-000002"))
    assert(Files.exists(Paths.get(dir, "snap-000001")))
  }

  test("an interrupted publish never becomes visible; vacuum removes the dangling dir") {
    val dir = Files.createTempDirectory("graft_snap_crash").toString
    Snapshots.publish((1 to 5).toDF("n"), dir)
    // simulate a publish that wrote data but DIED before the swap:
    // the directory exists, the pointer still names snap-000001
    (6 to 9).toDF("n").write.parquet(s"$dir/snap-000002")
    assert(Snapshots.currentId(dir).contains(1L))
    assert(Snapshots.read(spark, dir).count() == 5,
      "readers must never see the unswapped snapshot")
    // vacuum deletes ids above the pointer (dangling) and old ones
    val deleted = Snapshots.vacuum(dir, keep = 1)
    assert(deleted == Seq("snap-000002"), s"got $deleted")
    // the NEXT publish reuses the id — fresh write, ErrorIfExists
    // would have caught a half-cleaned dir
    val v = Snapshots.publish((6 to 9).toDF("n"), dir)
    assert(v == 2L && Snapshots.read(spark, dir).count() == 4)
  }

  test("compact produces an equivalent snapshot with fewer files and swaps to it") {
    val dir = Files.createTempDirectory("graft_snap_compact").toString
    // a deliberately fragmented first snapshot (32 partitions)
    Snapshots.publish((1 to 1000).toDF("n").repartition(32), dir)
    val before = Files.walk(Paths.get(Snapshots.currentPath(dir)))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(before > 8, s"fixture must be fragmented, got $before files")
    val (in, out, id) = Snapshots.compact(spark, dir, sortCol = Some("n"))
    assert(id == 2L && in == before && out < before,
      s"compact must shrink the file count: in=$in out=$out")
    val rows = Snapshots.read(spark, dir).as[Int].collect().sorted
    assert(rows.toSeq == (1 to 1000), "compaction must preserve the rows")
    // retention: keep current only; v1 is deleted, v2 survives
    val deleted = Snapshots.vacuum(dir, keep = 1)
    assert(deleted == Seq("snap-000001"))
    assert(Snapshots.read(spark, dir).count() == 1000)
  }

  test("snapshot table as the streaming verifier's document store") {
    // the 100 TB shape of verifiedIngest's `store` callback: the
    // document corpus lives in a snapshot table, the callback
    // re-resolves the pointer each micro-batch, and a publish that
    // lands MID-STREAM is picked up by the next batch — while any
    // in-flight batch keeps its own resolved snapshot (isolation)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft_snap_store").toString
    val base = "one two three four five six seven eight nine ten eleven"
    Snapshots.publish(Seq((10L, base)).toDF("doc_id", "text"), dir)
    val verified = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val q = graft.streaming.CorpusIngest.verifiedIngest(
      input.toDF().toDF("doc_id", "text", "ts"),
      store = () => Snapshots.read(spark, dir),
      onVerified = (pairs, _) => verified.synchronized {
        verified ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      },
      lateness = "1 hour")
    def t(ms: Long) = new java.sql.Timestamp(ms)
    try {
      input.addData((10L, base, t(1000)))
      q.processAllAvailable()
      // a doc arrives whose text matches a NOT-YET-PUBLISHED store
      // entry: publish first, then stream it — the callback resolves
      // the new snapshot and the verifier sees both docs
      Snapshots.publish(
        Seq((10L, base), (30L, base)).toDF("doc_id", "text"), dir)
      input.addData((30L, base, t(2000)))
      q.processAllAvailable()
      val got = verified.synchronized(verified.toList)
      assert(got.exists(p => Set(p._1, p._2) == Set(10L, 30L)),
        s"mid-stream publish must be visible to the next batch: $got")
    } finally q.stop()
  }

  test("vacuum min-age: young snapshots survive outside the keep window; a pinned reader stays readable") {
    val dir = Files.createTempDirectory("graft_snap_age").toString
    Snapshots.publish((1 to 10).toDF("n"), dir)
    Snapshots.publish((1 to 25).toDF("n"), dir)
    // pin a reader to snap-000002 while it is current...
    val pinned = Snapshots.read(spark, dir)
    assert(pinned.count() == 25)
    // ...then supersede it, putting it OUTSIDE the keep=1 window
    Snapshots.publish((1 to 40).toDF("n"), dir)
    // and simulate an in-flight publish (dangling id above the
    // pointer, data written, swap not yet executed)
    (1 to 7).toDF("n").write.parquet(s"$dir/snap-000004")
    // min-age shields everything younger than the horizon: the
    // pinned generation AND the in-flight publish both survive
    assert(Snapshots.vacuum(dir, keep = 1, minAgeMillis = 3600000L).isEmpty,
      "nothing written seconds ago may be vacuumed under a 1 h horizon")
    assert(pinned.count() == 25,
      "the pinned reader's files must outlive the vacuum")
    assert(Files.exists(Paths.get(dir, "snap-000004")))
    // the eager (min-age 0) form keeps the historical contract:
    // outside keep-N, gone — including the dangling directory
    val dropped = Snapshots.vacuum(dir, keep = 1)
    assert(dropped == Seq("snap-000001", "snap-000002", "snap-000004"),
      s"got $dropped")
    assert(Snapshots.read(spark, dir).count() == 40)
  }

  test("partitioned publish keeps partition pruning for readers") {
    val dir = Files.createTempDirectory("graft_snap_part").toString
    Snapshots.publish(
      (1 to 100).toDF("n").withColumn("part", col("n") % 4),
      dir, partitionCols = Seq("part"))
    val pruned = Snapshots.read(spark, dir).filter(col("part") === 1)
    assert(pruned.count() == 25)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(part"),
      s"partition filter must reach the scan:\n$scanned")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Snapshot-diff / SCD2 semantics on hand-built snapshots: exact
  * I/U/D classification, null-safe watched-column comparison, and the
  * version algebra of repeated applies. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldS = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null: String, 40.0))
    .toDF("k", "status", "price")
  private lazy val newS = Seq(
    (1L, "a", 10.0),            // unchanged
    (2L, "b", 25.0),            // price update
    (4L, null: String, 40.0),   // unchanged with a null watched col
    (5L, "e", 50.0))            // insert; 3 deleted
    .toDF("k", "status", "price")

  test("diff classifies I/U/D and drops unchanged keys (null-safe)") {
    val got = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("status", "price"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "U"), (3L, "D"), (5L, "I")))
  }

  test("diff of a snapshot against itself is empty") {
    assert(Cdc.snapshotDiff(newS, newS, Seq("k"), Seq("status", "price")).isEmpty)
  }

  test("scd2 apply closes updated/deleted versions and opens new ones") {
    val dim = oldS.withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
    val diff = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("status", "price"))
    val after = Cdc.scd2Apply(dim, diff, Seq("k"), Seq("status", "price"), ts = 1L)
    val rows = after.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 10.0, 0L, -1L),            // untouched, still open
      (2L, 20.0, 0L, 1L),             // closed at ts=1
      (2L, 25.0, 1L, -1L),            // new open version
      (3L, 30.0, 0L, 1L),             // delete: closed, nothing reopened
      (4L, 40.0, 0L, -1L),            // untouched (null watched col)
      (5L, 50.0, 1L, -1L)))           // insert: open at ts=1
  }

  test("scd2 applies change batches arriving on a stream (foreachBatch upsert)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val changes = MemoryStream[(Long, String, String, Double)](spark)
    // version 0 of the dimension
    var dim = Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "status", "price")
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
    val query = changes.toDF()
      .toDF("k", "change_type", "new_status", "new_price")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // each micro-batch is one dimension version; localCheckpoint
        // truncates the accreting lineage batch-over-batch
        dim = graft.operators.Cdc.scd2Apply(dim, batch,
          Seq("k"), Seq("status", "price"), ts = id + 1).localCheckpoint()
        ()
      }
      .start()
    try {
      changes.addData((2L, "U", "b", 25.0), (3L, "I", "c", 30.0))
      query.processAllAvailable()
      changes.addData((1L, "D", null, 0.0), (3L, "U", "c", 35.0))
      query.processAllAvailable()
      val rows = dim.orderBy("k", "valid_from").collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
      assert(rows.toSeq == Seq(
        (1L, 10.0, 0L, 2L),   // deleted in batch 2 → closed at ts=2
        (2L, 20.0, 0L, 1L),   // updated in batch 1 → closed at ts=1
        (2L, 25.0, 1L, -1L),  // current version
        (3L, 30.0, 1L, 2L),   // inserted at ts=1, updated at ts=2
        (3L, 35.0, 2L, -1L))) // current version
    } finally query.stop()
  }

  test("scd2 apply with the open slice reflecting newS then re-diffing is a fixpoint") {
    val dim = oldS.withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
    val diff = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("status", "price"))
    val after = Cdc.scd2Apply(dim, diff, Seq("k"), Seq("status", "price"), ts = 1L)
    // the open slice IS the new snapshot — so diffing again yields nothing
    val open = after.where(col("valid_to").isNull).select("k", "status", "price")
    assert(Cdc.snapshotDiff(open, newS, Seq("k"), Seq("status", "price")).isEmpty)
  }

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      (r.getLong(1), r.getDecimal(2).stripTrailingZeros))).toMap

  test("aggDelta: fold(prior, diff) equals the from-scratch aggregate") {
    // exercises every delta shape at once: a group-MOVING update
    // (1: a→b), a measure-only update (2), a full-group deletion
    // (c vanishes — group must drop out), and a new-group insert (e)
    val o = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "g", "m")
    val n = Seq((1L, "b", 11.0), (2L, "b", 25.0), (5L, "e", 50.0))
      .toDF("k", "g", "m")
    val folded = Cdc.aggDelta(
      Cdc.groupAggState(o, "g", "m"),
      Cdc.snapshotDiff(o, n, Seq("k"), Seq("g", "m")), "g", "m")
    val scratch = Cdc.groupAggState(n, "g", "m")
    assert(aggOf(folded) == aggOf(scratch))
    assert(!aggOf(folded).contains("c"), "emptied groups drop out")
    assert(aggOf(folded)("b")._1 == 2L, "the moved row lands in b")
  }

  test("aggDelta: randomized fold/recompute equivalence") {
    val rnd = new scala.util.Random(41)
    def snap(keys: Seq[Long]) = keys.map(k =>
      (k, s"g${rnd.nextInt(5)}", rnd.nextInt(1000) / 4.0)).toDF("k", "g", "m")
    for (_ <- 1 to 3) {
      val oldKeys = (1L to 60L).filter(_ => rnd.nextDouble() < 0.8)
      val newKeys = (1L to 70L).filter(_ => rnd.nextDouble() < 0.8)
      val (o, n) = (snap(oldKeys), snap(newKeys))
      val folded = Cdc.aggDelta(
        Cdc.groupAggState(o, "g", "m"),
        Cdc.snapshotDiff(o, n, Seq("k"), Seq("g", "m")), "g", "m")
      assert(aggOf(folded) == aggOf(Cdc.groupAggState(n, "g", "m")))
    }
  }

  test("streaming IVM: aggDelta folds diff micro-batches into live state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val changes = MemoryStream[
      (Long, String, Option[String], Option[Double],
        Option[String], Option[Double])](spark)
    val s0 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "m")
    var state = Cdc.groupAggState(s0, "g", "m").localCheckpoint()
    val query = changes.toDF()
      .toDF("k", "change_type", "old_g", "old_m", "new_g", "new_m")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = Cdc.aggDelta(state, batch, "g", "m").localCheckpoint()
        ()
      }
      .start()
    try {
      // s1 = {1:(a,10), 2:(a,21), 3:(c,30)} — 2 moves groups b→a
      changes.addData(
        (2L, "U", Some("b"), Some(20.0), Some("a"), Some(21.0)),
        (3L, "I", None, None, Some("c"), Some(30.0)))
      query.processAllAvailable()
      // s2 = {2:(a,21), 3:(a,5)} — 1 deleted, 3 moves c→a; b AND c gone
      changes.addData(
        (1L, "D", Some("a"), Some(10.0), None, None),
        (3L, "U", Some("c"), Some(30.0), Some("a"), Some(5.0)))
      query.processAllAvailable()
      val s2 = Seq((2L, "a", 21.0), (3L, "a", 5.0)).toDF("k", "g", "m")
      assert(aggOf(state) == aggOf(Cdc.groupAggState(s2, "g", "m")),
        "live folded state must equal the recompute over the final snapshot")
    } finally query.stop()
  }

  test("aggDelta: an empty change set is the identity on state") {
    val o = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "m")
    val folded = Cdc.aggDelta(
      Cdc.groupAggState(o, "g", "m"),
      Cdc.snapshotDiff(o, o, Seq("k"), Seq("g", "m")), "g", "m")
    assert(aggOf(folded) == aggOf(Cdc.groupAggState(o, "g", "m")))
  }
}

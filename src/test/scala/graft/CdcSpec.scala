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

  test("streaming IVM end-to-end: ONE CDC stream drives aggDelta AND " +
       "componentsDelta, both equal from-scratch at EVERY micro-batch") {
    // VERDICT r9 item 8: the aggregate-IVM and label-IVM folds each
    // had their own streaming spec; this composes them — one
    // foreachBatch holds BOTH live states, folds each micro-batch
    // into both, and checks each against a full recompute INSIDE the
    // batch (not only at the end). Events are document CDC rows
    // (k, change_type, old_g, old_m, new_g, new_m, edge): the agg
    // fold sees I/U/D; the graph fold sees new docs as self-pairs
    // plus any carried near-dup edge. Deletions are agg-only by
    // design — the near-dup graph is monotone (tombstoned docs keep
    // their cluster), which mirrors the batch componentsDelta
    // contract (prior labels only ever gain edges).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.GraphOps
    val changes = MemoryStream[(Long, String, Option[String], Option[Double],
      Option[String], Option[Double], Option[Long])](spark)
    val s0 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "m")
    var aggState = Cdc.groupAggState(s0, "g", "m").localCheckpoint()
    var labels = GraphOps.connectedComponents(
      Seq((1L, 2L)).toDF("id1", "id2")).localCheckpoint()
    // driver-side ground truth (tiny — test bookkeeping only)
    val snap = collection.mutable.Map(1L -> ("a", 10.0), 2L -> ("b", 20.0))
    val docs = collection.mutable.Set(1L, 2L)
    val edges = collection.mutable.Set((1L, 2L))
    val failures = collection.mutable.ArrayBuffer.empty[String]
    val query = changes.toDF()
      .toDF("k", "change_type", "old_g", "old_m", "new_g", "new_m", "edge")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val b = batch.localCheckpoint()
        // fold 1: aggregate IVM
        aggState = Cdc.aggDelta(aggState, b, "g", "m").localCheckpoint()
        // fold 2: label IVM — new docs enter as self-pairs, any row
        // may carry a new edge
        val newPairs = b.filter(col("change_type") === "I")
          .select(col("k").as("id1"), col("k").as("id2"))
          .unionByName(b.filter(col("edge").isNotNull)
            .select(col("k").as("id1"), col("edge").as("id2")))
        labels = GraphOps.componentsDelta(labels, newPairs).localCheckpoint()
        // advance the ground truth, then compare BOTH states against
        // from-scratch recomputes for THIS batch
        b.collect().foreach { r =>
          val k = r.getLong(0)
          r.getString(1) match {
            case "I" => snap(k) = (r.getString(4), r.getDouble(5)); docs += k
            case "U" => snap(k) = (r.getString(4), r.getDouble(5))
            case "D" => snap.remove(k)
          }
          if (!r.isNullAt(6)) edges += ((k, r.getLong(6)))
        }
        val snapDf = snap.toSeq.map { case (k, (g, m)) => (k, g, m) }
          .toDF("k", "g", "m")
        if (aggOf(aggState) != aggOf(Cdc.groupAggState(snapDf, "g", "m")))
          failures += s"batch $id: aggDelta state != recompute"
        val scratch = GraphOps.connectedComponents(
          docs.toSeq.map(d => (d, d)).toDF("id1", "id2")
            .unionByName(edges.toSeq.toDF("id1", "id2")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val live = labels.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        if (live != scratch)
          failures += s"batch $id: componentsDelta labels != recompute"
        ()
      }
      .start()
    try {
      // batch 0: two inserts, one with a near-dup edge to doc 1
      changes.addData(
        (3L, "I", None, None, Some("c"), Some(30.0), Some(1L)),
        (4L, "I", None, None, Some("a"), Some(40.0), None))
      query.processAllAvailable()
      // batch 1: an update that MOVES groups (b→a) and bridges the
      // {1,2,3} cluster to singleton {4} via a new edge
      changes.addData(
        (2L, "U", Some("b"), Some(20.0), Some("a"), Some(21.0), Some(4L)))
      query.processAllAvailable()
      // batch 2: a deletion (agg-only), plus two inserts forming a
      // NEW cluster disjoint from everything prior
      changes.addData(
        (3L, "D", Some("c"), Some(30.0), None, None, None),
        (5L, "I", None, None, Some("b"), Some(50.0), None),
        (6L, "I", None, None, Some("b"), Some(60.0), Some(5L)))
      query.processAllAvailable()
    } finally query.stop()
    assert(failures.isEmpty, failures.mkString("; "))
    // end-state sanity on top of the per-batch equalities: groups
    // {a: docs 1,2,4} {b: 5,6}; clusters {1,2,3,4} and {5,6}
    assert(aggOf(aggState).keySet == Set("a", "b"))
    assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 5L)))
  }

  // ---- bounded-state top-k IVM ----

  test("streaming top-k IVM: the fold rides foreachBatch and equals " +
       "the from-scratch top-k at EVERY micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val inserts = MemoryStream[(String, Long, Long)](spark)
    val s0 = Seq(("a", 1L, 100L), ("a", 2L, 90L)).toDF("g", "id", "v")
    var state = Cdc.topkState(s0, "g", "v", "id", k = 2).localCheckpoint()
    val seen = collection.mutable.ArrayBuffer(("a", 1L, 100L), ("a", 2L, 90L))
    val failures = collection.mutable.ArrayBuffer.empty[String]
    val query = inserts.toDF().toDF("g", "id", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = Cdc.topkDelta(state, batch, "g", "v", "id", k = 2)
          .localCheckpoint()
        seen ++= batch.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2)))
        val scratch = Cdc.topkState(
          seen.toSeq.toDF("g", "id", "v"), "g", "v", "id", k = 2)
        val got = rows(state)
        val want = rows(scratch)
        if (got != want) failures += s"batch mismatch: $got != $want"
        ()
      }.start()
    try {
      inserts.addData(("a", 3L, 95L), ("b", 4L, 10L)) // displaces id=2
      query.processAllAvailable()
      inserts.addData(("a", 5L, 1L), ("b", 6L, 20L))  // a unchanged
      query.processAllAvailable()
    } finally query.stop()
    assert(failures.isEmpty, failures.mkString("; "))
    assert(rows(state) == Seq(("a", 1, 1L, 100L), ("a", 2, 3L, 95L),
      ("b", 1, 6L, 20L), ("b", 2, 4L, 10L)))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("topkDelta: fold(state, inserts) == from-scratch top-k, " +
       "including a delta row displacing a state row") {
    val base = Seq(("a", 1L, 100L), ("a", 2L, 90L), ("a", 3L, 80L),
        ("a", 4L, 70L), ("b", 5L, 10L))
      .toDF("g", "id", "v")
    val ins = Seq(("a", 6L, 95L),   // displaces id=3 from a's top-3
        ("b", 7L, 5L))              // b still under k: both rows kept
      .toDF("g", "id", "v")
    val state = Cdc.topkState(base, "g", "v", "id", k = 3)
    val folded = Cdc.topkDelta(state, ins, "g", "v", "id", k = 3)
    val scratch = Cdc.topkState(base.unionByName(ins), "g", "v", "id", k = 3)
    assert(rows(folded) == rows(scratch))
    assert(rows(folded) == Seq(
      ("a", 1, 1L, 100L), ("a", 2, 6L, 95L), ("a", 3, 2L, 90L),
      ("b", 1, 5L, 10L), ("b", 2, 7L, 5L)))
  }

  test("topkDelta: value ties break to the smaller id, " +
       "deterministically under any partitioning") {
    val base = Seq(("a", 9L, 50L), ("a", 7L, 50L)).toDF("g", "id", "v")
    val ins = Seq(("a", 8L, 50L)).toDF("g", "id", "v")
    val state = Cdc.topkState(base.repartition(7), "g", "v", "id", k = 2)
    val folded = Cdc.topkDelta(state, ins.repartition(3), "g", "v", "id", 2)
    assert(rows(folded) == Seq(("a", 1, 7L, 50L), ("a", 2, 8L, 50L)))
  }

  test("topkDelta folds associatively batch by batch: " +
       "fold(fold(s, d1), d2) == topk(all)") {
    val base = (1L to 20L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val d1 = Seq(("g", 21L, 500L), ("g", 22L, 1L)).toDF("g", "id", "v")
    val d2 = Seq(("g", 23L, 250L), ("h", 24L, 7L)).toDF("g", "id", "v")
    val s0 = Cdc.topkState(base, "g", "v", "id", k = 3)
    val s2 = Cdc.topkDelta(Cdc.topkDelta(s0, d1, "g", "v", "id", 3),
      d2, "g", "v", "id", 3)
    val scratch = Cdc.topkState(
      base.unionByName(d1).unionByName(d2), "g", "v", "id", k = 3)
    assert(rows(s2) == rows(scratch))
    // bounded state: never more than k rows per group in the fold
    assert(s2.groupBy("g").count().collect().forall(_.getLong(1) <= 3))
  }

  // ---- delete-capable top-k (k' shadow state), VERDICT r11 item 4 ----

  // ten rows 100..91 per group, ids 1..10 — k'=4 shadow holds
  // {100,99,98,97}, rows 96..91 live below the shadow horizon
  private def tenRows(g: String) =
    (1L to 10L).map(i => (g, i, 101L - i))

  private def serve(df: org.apache.spark.sql.DataFrame, k: Int) = rows(
    df.filter(!col("needs_refill") && col("rnk") <= k)
      .select("g", "rnk", "id", "v"))

  test("topkShadowState: truncated flag marks exactly the groups " +
       "with more than k' rows") {
    val df = (tenRows("a") ++ Seq(("b", 1L, 5L), ("b", 2L, 4L)))
      .toDF("g", "id", "v")
    val st = Cdc.topkShadowState(df, "g", "v", "id", k = 2, kPrime = 4)
    val byG = st.collect().groupBy(_.getString(0))
    assert(byG("a").length == 4 && byG("a").forall(_.getBoolean(4)))
    assert(byG("b").length == 2 && byG("b").forall(!_.getBoolean(4)))
    // exactly-k' group: state holds ALL rows, so NOT truncated
    val st4 = Cdc.topkShadowState(
      (1L to 4L).map(i => ("c", i, i)).toDF("g", "id", "v"),
      "g", "v", "id", k = 2, kPrime = 4)
    assert(st4.collect().forall(!_.getBoolean(4)))
  }

  test("topkFold: a delete inside the budget promotes a hidden " +
       "shadow row and matches the from-scratch recompute") {
    val base = tenRows("a").toDF("g", "id", "v")
    val st = Cdc.topkShadowState(base, "g", "v", "id", k = 2, kPrime = 4)
    // delete the top-2 (d = 2 = k'-k, the exact budget): the true
    // top-2 becomes {98, 97} — both held only in the SHADOW region
    val dels = Seq(1L, 2L).toDF("id")
    val folded = Cdc.topkFold(st, base.limit(0), dels,
      "g", "v", "id", k = 2, kPrime = 4)
    assert(folded.collect().forall(!_.getBoolean(5)), "within budget")
    assert(serve(folded, 2) == Seq(("a", 1, 3L, 98L), ("a", 2, 4L, 97L)))
  }

  test("topkFold/topkRefill: past-budget deletes raise the refill " +
       "signal instead of silently under-filling") {
    val base = tenRows("a").toDF("g", "id", "v")
    val st = Cdc.topkShadowState(base, "g", "v", "id", k = 2, kPrime = 4)
    // d = 3 > k'-k = 2: survivors {97} < k — the true top-2 includes
    // 96, which the state never held; must be reported, not served
    val dels = Seq(1L, 2L, 3L).toDF("id")
    val folded = Cdc.topkFold(st, base.limit(0), dels,
      "g", "v", "id", k = 2, kPrime = 4)
    assert(folded.collect().forall(r =>
      r.getBoolean(5) && r.getBoolean(4)), "flagged AND re-truncated")
    assert(serve(folded, 2).isEmpty, "a refill group is never served")
    val rep = Cdc.topkRefill(st, dels, "g", "id", k = 2).collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("a", 4L, 3L)))
  }

  test("topkRefill: a group WIPED by deletes still reports (it has " +
       "no surviving row to carry the flag); a non-truncated group " +
       "wiped exactly is silent") {
    val df = (tenRows("a") ++ Seq(("b", 21L, 5L), ("b", 22L, 4L)))
      .toDF("g", "id", "v")
    val st = Cdc.topkShadowState(df, "g", "v", "id", k = 2, kPrime = 4)
    val dels = Seq(1L, 2L, 3L, 4L, 21L, 22L).toDF("id")
    val folded = Cdc.topkFold(st, df.limit(0), dels,
      "g", "v", "id", k = 2, kPrime = 4)
    assert(folded.filter(col("g") === "a").isEmpty,
      "wiped group has no state rows left")
    val rep = Cdc.topkRefill(st, dels, "g", "id", k = 2)
      .select("g").as[String].collect().toSeq
    assert(rep == Seq("a"),
      s"truncated wipe reports, exact wipe (b held ALL its rows) does not: $rep")
  }

  test("topkRepair consumes the refill signal: rebuilt groups " +
       "(including a WIPED one) serve exactly, healthy state is " +
       "untouched, and the repaired top-k is globally exact") {
    val df = (tenRows("a") ++ Seq(("b", 21L, 5L), ("b", 22L, 4L),
        ("b", 23L, 3L))).toDF("g", "id", "v")
    val st = Cdc.topkShadowState(df, "g", "v", "id", k = 2, kPrime = 4)
    // wipe a's whole shadow (refill via the report only) and delete
    // one b row (within budget — b is not even truncated)
    val dels = Seq(1L, 2L, 3L, 4L, 21L).toDF("id")
    val ins = Seq(("c", 51L, 7L)).toDF("g", "id", "v")
    val folded = Cdc.topkFold(st, ins, dels, "g", "v", "id",
      k = 2, kPrime = 4)
    val refill = Cdc.topkRefill(st, dels, "g", "id", k = 2)
    val newFacts = df.join(dels, Seq("id"), "left_anti")
      .unionByName(ins.select("g", "id", "v"))
    val repaired = Cdc.topkRepair(folded, refill, newFacts,
      "g", "v", "id", k = 2, kPrime = 4)
    assert(repaired.collect().forall(!_.getAs[Boolean]("needs_refill")))
    val served = rows(repaired.filter(col("rnk") <= 2)
      .select("g", "rnk", "id", "v"))
    val scratch = rows(Cdc.topkState(newFacts, "g", "v", "id", k = 2))
    assert(served == scratch,
      s"globally exact after repair: $served vs $scratch")
    // a's rebuilt rows come from the facts below its old shadow
    // horizon — rows the folded state NEVER held
    assert(served.filter(_._1 == "a").map(_._4) == Seq(96L, 95L))
  }

  test("topkFold: inserts and deletes in one batch — insert-only " +
       "groups serve exactly with no refill") {
    val base = tenRows("a").toDF("g", "id", "v")
    val st = Cdc.topkShadowState(base, "g", "v", "id", k = 2, kPrime = 4)
    val ins = Seq(("a", 50L, 99L),         // lands between survivors
        ("c", 51L, 7L), ("c", 52L, 6L))    // brand-new group
      .toDF("g", "id", "v")
    val dels = Seq(1L).toDF("id")
    val folded = Cdc.topkFold(st, ins, dels, "g", "v", "id",
      k = 2, kPrime = 4)
    assert(serve(folded, 2) == Seq(
      ("a", 1, 2L, 99L), ("a", 2, 50L, 99L),  // tie → smaller id first
      ("c", 1, 51L, 7L), ("c", 2, 52L, 6L)))
  }

  test("topkFold: an id inserted AND deleted in one batch folds as " +
       "inserted (deletes target pre-existing facts only — the " +
       "upsert reading of (facts \\ deletes) ∪ inserts)") {
    val base = tenRows("a").toDF("g", "id", "v")
    val st = Cdc.topkShadowState(base, "g", "v", "id", k = 2, kPrime = 4)
    // delete id 1 (a pre-existing shadow row, old v=100) and
    // RE-insert it with a NEW value in the same batch — the classic
    // CDC upsert; v=99 ties id 2 and wins the tie on smaller id
    val ins = Seq(("a", 1L, 99L)).toDF("g", "id", "v")
    val dels = Seq(1L).toDF("id")
    val folded = Cdc.topkFold(st, ins, dels, "g", "v", "id",
      k = 2, kPrime = 4)
    val newFacts = base.join(dels, Seq("id"), "left_anti")
      .unionByName(ins.select("g", "id", "v"))
    assert(serve(folded, 2) ==
      rows(Cdc.topkState(newFacts, "g", "v", "id", k = 2)),
      "fold matches the recompute over (facts \\ deletes) ∪ inserts")
    assert(serve(folded, 2) ==
      Seq(("a", 1, 1L, 99L), ("a", 2, 2L, 99L)),
      "the re-inserted id serves with its NEW value (old 100 gone, " +
        "an anti-joined insert would have dropped id 1 entirely)")
  }

  test("streaming leaderboard IVM: topkFold folds insert/delete " +
       "micro-batches into live shadow state; refill groups surface, " +
       "exact groups track the recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // change feed: op I/D with the row payload (deletes carry the id)
    val changes = MemoryStream[(String, String, Long, Long)](spark)
    val base = (tenRows("a") ++ tenRows("b")).toDF("g", "id", "v")
      .withColumn("id", when(col("g") === "b", col("id") + 100L)
        .otherwise(col("id")))
    var state = Cdc.topkShadowState(base, "g", "v", "id",
      k = 2, kPrime = 4).localCheckpoint()
    var live = Seq.empty[(String, Long, Long)] // mirror of the facts
    base.collect().foreach(r =>
      live :+= ((r.getString(0), r.getLong(1), r.getLong(2))))
    val query = changes.toDF().toDF("op", "g", "id", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        val ins = b.filter(col("op") === "I").select("g", "id", "v")
        val dels = b.filter(col("op") === "D").select("id")
        state = Cdc.topkFold(state, ins, dels, "g", "v", "id",
          k = 2, kPrime = 4).localCheckpoint()
        b.unpersist(); ()
      }.start()
    try {
      // batch 1: delete a's top row (budget d=1 <= k'-k=2: promotes
      // the rank-2 shadow holding), insert a fresh b row above all
      changes.addData(("D", "a", 1L, 0L), ("I", "b", 150L, 999L))
      query.processAllAvailable()
      live = live.filterNot(_._2 == 1L) :+ (("b", 150L, 999L))
      // batch 2: blow a's budget (two more deletes -> survivors < k)
      changes.addData(("D", "a", 2L, 0L), ("D", "a", 3L, 0L))
      query.processAllAvailable()
      live = live.filterNot(t => t._2 == 2L || t._2 == 3L)
      val served = rows(state
        .filter(!col("needs_refill") && col("rnk") <= 2)
        .select("g", "rnk", "id", "v"))
      val scratch = rows(Cdc.topkState(
        live.toDF("g", "id", "v"), "g", "v", "id", k = 2))
      // b never exceeded its budget: its served top-2 must equal the
      // from-scratch recompute over the live facts
      assert(served.filter(_._1 == "b") == scratch.filter(_._1 == "b"),
        s"served $served vs scratch $scratch")
      // a blew its budget ACROSS batches (1 + 2 deletes against the
      // ORIGINAL build would be fine per-batch, but batch-2's state
      // held only 3 rows after batch-1's fold): the flag must be up
      // and the group unserved, not silently wrong
      assert(served.forall(_._1 != "a"),
        s"budget-blown group must not serve: $served")
      assert(state.filter(col("g") === "a").collect()
        .forall(_.getAs[Boolean]("needs_refill")),
        "refill flag must survive on the live state")
    } finally query.stop()
  }

  test("topkFold on the oracle fixture: non-refill folded top-5 == " +
       "from-scratch recompute, and the fixture really exercises " +
       "delete-promotes-hidden-row") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val f = o.select(pmod(col("o_custkey"), lit(50)).as("g"),
      col("o_orderkey").as("id"),
      (col("o_totalprice").cast("decimal(9,2)") * 100)
        .cast("long").as("v"))
    val dels = f.filter(pmod(col("id"), lit(13)) === 0 ||
      (col("g") < 5 && pmod(col("id"), lit(4)) < 3))
    val ins = f.filter(pmod(col("id"), lit(11)) === 0)
      .select(col("g"), (col("id") + 1000000000L).as("id"), col("v"))
    val st = Cdc.topkShadowState(f, "g", "v", "id", k = 5, kPrime = 10)
    val folded = Cdc.topkFold(st, ins, dels, "g", "v", "id",
      k = 5, kPrime = 10)
    val servedDf = folded
      .filter(!col("needs_refill") && col("rnk") <= 5)
      .select("g", "rnk", "id", "v")
    val served = servedDf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val refillG = Cdc.topkRefill(st, dels, "g", "id", k = 5)
      .select("g").as[Long].collect().toSet
    val scratch = Cdc.topkState(
        f.join(dels.select("id"), Seq("id"), "left_anti")
          .unionByName(ins.select("id", "g", "v")),
        "g", "v", "id", k = 5)
      .filter(!col("g").isin(refillG.toSeq: _*))
      .select("g", "rnk", "id", "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(served == scratch, "IVM exactness on every non-refill group")
    // the promotion evidence: some served row was only a SHADOW row
    // (pre-batch rank 6..10) before the deletes promoted it
    val shadowIds = st.filter(col("rnk") > 5)
      .select("id").as[Long].collect().toSet
    assert(served.exists(t => t._2 <= 5 && shadowIds(t._3)),
      "fixture must contain a delete-promotes-hidden-row case")
    // and the heavy-wash groups really fire the signal at this scale
    assert(refillG.nonEmpty, "fixture must exercise the refill signal")
  }
}

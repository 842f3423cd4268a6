package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.streaming.GraphRankStream

/** Streaming maintenance of the PageRank state pair: signed
  * micro-batches fold into the snapshot table, the served ranks
  * equal from-scratch on the cumulative graph after every batch —
  * including across a mid-stream kill/restart — and contract
  * violations fail the query loudly. */
class GraphRankStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ranksOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("signed micro-batches through maintain() equal from-scratch on " +
       "the final graph, across a mid-stream kill/restart; stranded " +
       "nodes survive to re-connect") {
    val table = tmp("graft_rankstream_tbl")
    val ckpt = tmp("graft_rankstream_ckpt")
    // universe: a 4-cycle and a 3-cycle
    val edges0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L))
    GraphRankStream.bootstrap(edges0.toDF("id1", "id2"), table,
      iterations = 4)
    assert(ranksOf(GraphRankStream.currentRanks(spark, table)) ==
      ranksOf(GraphOps.pageRank(edges0.toDF("id1", "id2"),
        iterations = 4)),
      "bootstrap serves the from-scratch ranks")
    val input = MemoryStream[(Long, Long, String)](spark)
    val stream = input.toDF().toDF("id1", "id2", "op")
    def start() = GraphRankStream.maintain(stream, table, Some(ckpt))
    val q1 = start()
    input.addData((1L, 3L, "add"))
    q1.processAllAvailable()
    input.addData((4L, 1L, "del"), (4L, 5L, "add"))
    q1.processAllAvailable()
    q1.stop() // mid-stream kill
    // the cumulative graph after two folded batches
    val g2 = (edges0.filterNot(_ == ((4L, 1L))) ++
      Seq((1L, 3L), (4L, 5L))).toDF("id1", "id2")
    assert(ranksOf(GraphRankStream.currentRanks(spark, table)) ==
      ranksOf(GraphOps.pageRank(g2, iterations = 4)),
      "pre-kill state serves from-scratch ranks on the batch-2 graph")
    val q2 = start()
    try {
      // batch 3 strands node 6 (both its edges retracted) — it must
      // hold a teleport-only rank in the maintained state, not vanish
      input.addData((5L, 6L, "del"), (6L, 7L, "del"))
      q2.processAllAvailable()
      assert(GraphRankStream.currentRanks(spark, table).count() == 7L,
        "the universe never shrinks: stranded node 6 still served")
      // batch 4 re-connects it
      input.addData((6L, 1L, "add"))
      q2.processAllAvailable()
    } finally q2.stop()
    val finalEdges = (edges0
      .filterNot(e => Seq((4L, 1L), (5L, 6L), (6L, 7L)).contains(e)) ++
      Seq((1L, 3L), (4L, 5L), (6L, 1L)))
    // nobody is stranded in the final graph, so from-scratch pageRank
    // (edge-derived node set) is directly comparable
    assert(ranksOf(GraphRankStream.currentRanks(spark, table)) ==
      ranksOf(GraphOps.pageRank(finalEdges.toDF("id1", "id2"),
        iterations = 4)),
      "four signed batches across a restart == from-scratch")
    // the FULL maintained trajectory matches from-scratch too — the
    // state stays foldable, not just servable
    val st = GraphRankStream.readState(spark, table)
    val scratch = GraphOps.pageRankTrajectory(
      finalEdges.toDF("id1", "id2"), iterations = 4)
    def trajSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(trajSet(st.traj) == trajSet(scratch),
      "maintained trajectory == from-scratch trajectory")
    assert(st.appliedBatch >= 3L, "the applied-batch marker advanced")
  }

  test("a replayed epoch is skipped: folding is exactly-once even " +
       "when the batch is re-delivered") {
    val table = tmp("graft_rankstream_replay")
    GraphRankStream.bootstrap(
      Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"), table, iterations = 3)
    val st0 = GraphRankStream.readState(spark, table)
    // manual re-delivery of epoch 0 twice against the same table —
    // the second publish must be skipped by the marker, leaving one
    // new snapshot, not two
    def foldEpoch(epoch: Long): Unit = {
      val st = GraphRankStream.readState(spark, table)
      if (epoch > st.appliedBatch) {
        val (t2, s2) = GraphOps.pageRankStateFold(st.traj, st.edgesDeg,
          Seq((1L, 3L)).toDF("id1", "id2"),
          Seq.empty[(Long, Long)].toDF("id1", "id2"), 3)
        GraphRankStream.publish(table, t2, s2, epoch, 3)
      }
    }
    foldEpoch(0L)
    val snapAfterFirst = graft.sources.Snapshots.currentId(table).get
    foldEpoch(0L) // replay
    assert(graft.sources.Snapshots.currentId(table).get == snapAfterFirst,
      "replayed epoch publishes nothing")
    assert(ranksOf(GraphRankStream.currentRanks(spark, table)) ==
      ranksOf(GraphOps.pageRank(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2"), 3)),
      "state reflects exactly one application of the batch")
    assert(st0.appliedBatch == -1L, "bootstrap marker is -1")
  }

  test("contract violations fail the query loudly: a node-adding " +
       "batch and an unknown op both refuse") {
    val table = tmp("graft_rankstream_refuse")
    GraphRankStream.bootstrap(
      Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"), table, iterations = 3)
    val input = MemoryStream[(Long, Long, String)](spark)
    val q = GraphRankStream.maintain(
      input.toDF().toDF("id1", "id2", "op"), table, None)
    try {
      input.addData((3L, 99L, "add")) // 99 is outside the universe
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("new node"),
        s"universe violation surfaces the fold's refusal: ${e.getMessage}")
    } finally q.stop()
    val input2 = MemoryStream[(Long, Long, String)](spark)
    val q2 = GraphRankStream.maintain(
      input2.toDF().toDF("id1", "id2", "op"), table, None)
    try {
      input2.addData((1L, 3L, "upsert"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("op outside"),
        s"unknown op refuses: ${e.getMessage}")
    } finally q2.stop()
    // the refused batches never mutated the state
    assert(ranksOf(GraphRankStream.currentRanks(spark, table)) ==
      ranksOf(GraphOps.pageRank(
        Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"), 3)))
  }
}

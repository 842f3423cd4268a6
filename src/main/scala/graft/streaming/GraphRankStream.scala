package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.GraphOps
import graft.sources.Snapshots

/** Streaming maintenance of the incremental-PageRank STATE PAIR —
  * the graph IVM family's streaming seam (VERDICT r14 item 4: every
  * other fold family has a streaming composition with a restart
  * spec; the graph folds were batch-only). A `foreachBatch` consumer
  * folds each micro-batch's signed edge delta through
  * [[graft.operators.GraphOps.pageRankStateFold]] and persists the
  * updated (trajectory, edge-state) pair — so after every
  * micro-batch the served ranks equal a from-scratch
  * [[graft.operators.GraphOps.pageRank]] on the stream's cumulative
  * graph (the spec's invariant, including across a kill/restart).
  *
  * State protocol: the pair persists as ONE [[Snapshots]] table —
  * each snapshot is a single packed relation holding the edge state,
  * the full trajectory, AND the applied-batch marker, so the
  * pointer swap publishes all three ATOMICALLY. Exactly-once across
  * restarts follows from that atomicity plus foreachBatch's epoch
  * ids: a replayed batch (epoch ≤ the marker) is skipped; a batch
  * whose publish never swapped the pointer left the old state intact
  * and refolds identically. This is the same write-then-swap
  * pointer discipline the IVF index uses for rebuild-under-pinned-
  * probe ([[graft.similarity.IvfIndex]]).
  *
  * Node-universe contract (the ranking folds' law, stated loudly):
  * [[bootstrap]] FIXES the node universe — teleport mass denominates
  * by it, so a batch whose additions name an unknown node makes the
  * fold REFUSE and the query fail (visible, not silent). Deletions
  * never shrink the universe (stranded nodes hold teleport-only
  * rank and can re-connect later). A corpus whose universe grows
  * re-bootstraps on a cadence — the IVF index's rebuild pattern —
  * folding only inside each epoch.
  *
  * Scale posture: per batch, the fold's rounds are ball-sized (or
  * the priced recompute on a scattered batch), and the persisted
  * state write is the honest floor — the new |E| relation and
  * (iterations+1)·|V| trajectory must land on storage regardless of
  * how they were derived. Snapshots accumulate one directory per
  * batch; run [[graft.sources.Snapshots.vacuum]] on the maintenance
  * cadence. */
object GraphRankStream {

  private val RelEdge = "edge"
  private val RelTraj = "traj"
  private val RelMeta = "meta"

  /** The maintained pair plus its watermark: `appliedBatch` is the
    * last folded foreachBatch epoch (−1 after bootstrap). */
  case class RankState(traj: DataFrame, edgesDeg: DataFrame,
                       appliedBatch: Long, iterations: Int)

  /** Pack and publish (trajectory, edge state, marker) as the next
    * snapshot — one atomic pointer swap for all three. */
  def publish(tableDir: String, traj: DataFrame, edgesDeg: DataFrame,
              batchId: Long, iterations: Int): Long = {
    val packed = edgesDeg.select(lit(RelEdge).as("rel"),
        col("src").as("a"), col("dst").as("b"), col("deg").as("c"))
      .unionByName(traj.select(lit(RelTraj).as("rel"),
        col("node").as("a"), col("iter").cast("long").as("b"),
        col("pr").as("c")))
      .unionByName(edgesDeg.sparkSession.range(1)
        .select(lit(RelMeta).as("rel"), lit(batchId).as("a"),
          lit(iterations.toLong).as("b"), lit(0L).as("c")))
    Snapshots.publish(packed, tableDir)
  }

  /** Read the current snapshot back as the typed pair. The returned
    * frames are pinned to the snapshot directory current at resolve
    * time (Snapshots isolation). */
  def readState(spark: SparkSession, tableDir: String): RankState = {
    val packed = Snapshots.read(spark, tableDir)
    val meta = packed.filter(col("rel") === RelMeta)
      .select("a", "b").head()
    RankState(
      packed.filter(col("rel") === RelTraj)
        .select(col("a").as("node"), col("b").cast("int").as("iter"),
          col("c").as("pr")),
      packed.filter(col("rel") === RelEdge)
        .select(col("a").as("src"), col("b").as("dst"),
          col("c").as("deg")),
      meta.getLong(0), meta.getLong(1).toInt)
  }

  /** Fix the node universe and publish the initial pair from a batch
    * graph. Returns the snapshot id. */
  def bootstrap(pairs: DataFrame, tableDir: String,
                iterations: Int = 5): Long = {
    val st = GraphOps.pageRankEdgeState(pairs)
    val traj = GraphOps.pageRankTrajectoryFromEdges(st, iterations)
    publish(tableDir, traj, st, batchId = -1L, iterations)
  }

  /** The served ranks: iterate `iterations` of the current
    * snapshot. */
  def currentRanks(spark: SparkSession, tableDir: String): DataFrame = {
    val st = readState(spark, tableDir)
    st.traj.filter(col("iter") === st.iterations).select("node", "pr")
  }

  /** Start the maintenance query over an edge stream. `edges` needs
    * columns (id1, id2) and optionally `op` ∈ {"add", "del"} — no op
    * column means every row is an addition. Each micro-batch folds
    * signed through the maintained pair and publishes; replayed
    * epochs are skipped (see the exactly-once argument above). Pass
    * `checkpointDir` for restartable consumption. */
  def maintain(edges: DataFrame, tableDir: String,
               checkpointDir: Option[String] = None): StreamingQuery = {
    var w = edges.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val spark = batch.sparkSession
        val st = readState(spark, tableDir)
        if (epoch > st.appliedBatch) {
          val b = batch.localCheckpoint(eager = true)
          val hasOp = b.columns.contains("op")
          if (hasOp) {
            val bad = b.filter(!col("op").isin("add", "del")).count()
            if (bad > 0L)
              throw new IllegalArgumentException(
                s"GraphRankStream: $bad row(s) with op outside " +
                  "{add, del} — refusing the batch rather than " +
                  "guessing a sign")
          }
          val adds =
            if (hasOp) b.filter(col("op") === "add").select("id1", "id2")
            else b.select("id1", "id2")
          val dels =
            if (hasOp) b.filter(col("op") === "del").select("id1", "id2")
            else b.select("id1", "id2").limit(0)
          val (traj2, st2) = GraphOps.pageRankStateFold(
            st.traj, st.edgesDeg, adds, dels, st.iterations)
          publish(tableDir, traj2, st2, epoch, st.iterations)
        }
        ()
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }
}

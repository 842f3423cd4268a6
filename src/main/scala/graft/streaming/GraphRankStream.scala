package graft.streaming

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import graft.operators.GraphOps
import graft.sources.Snapshots

/** Streaming maintenance of the graph-IVM STATE PACK — the graph
  * fold family's streaming seam (VERDICT r14 item 4, completed per
  * r15 item 2: not just plain PageRank — the PPR trajectory and the
  * components labeling fold off the SAME edge state in the same
  * micro-batch, through [[graft.operators.GraphOps.graphStatesFold]],
  * which pays the delta prep, the locality probe, and the survivor
  * state scan once for all three families). A `foreachBatch`
  * consumer folds each micro-batch's signed edge delta and persists
  * the updated pack — so after every micro-batch the served ranks /
  * labels equal their from-scratch operators on the stream's
  * cumulative survivor graph (the spec's invariant, including across
  * a kill/restart and for deletion batches).
  *
  * State protocol: the pack persists as ONE [[Snapshots]] table —
  * each snapshot is a single packed relation holding the edge state,
  * the trajectories, the labels, AND the applied-batch marker, so
  * the pointer swap publishes them ATOMICALLY. Exactly-once across
  * restarts follows from that atomicity plus foreachBatch's epoch
  * ids, with the THREE-WAY guard (ADVICE r15 — the old `epoch >
  * marker` alone silently dropped batches after a restart without
  * the original checkpoint):
  *  - `epoch == marker`: the one legitimate replay — the publish
  *    landed but the checkpoint commit didn't; skip.
  *  - `epoch > marker`: a new batch; fold and publish.
  *  - `epoch < marker`: the stream restarted WITHOUT its original
  *    checkpointLocation (epochs restarted at 0 while the marker
  *    sits at N) — folding would silently drop N−epoch batches, so
  *    REFUSE loudly; restore the checkpoint or re-[[bootstrap]].
  *
  * Single-writer lease (VERDICT r15 item 6): two concurrent
  * `maintain` loops on one tableDir would interleave read-fold-
  * publish and lose updates silently. [[maintain]] takes an OS file
  * lock on `tableDir/_maintainer.lock` for the life of the query
  * (released on query termination, crash-safe — the OS drops the
  * lock with the process); a second `maintain` on the same table
  * fails loudly at start.
  *
  * Node-universe contract (the ranking folds' law, stated loudly):
  * [[bootstrap]] FIXES the node universe — teleport mass denominates
  * by it, so a batch whose additions name an unknown node makes the
  * fold REFUSE and the query fail (visible, not silent). Deletions
  * never shrink the universe (stranded nodes hold teleport-only
  * rank / singleton labels and can re-connect later). A corpus whose
  * universe grows re-bootstraps on a cadence — the IVF index's
  * rebuild pattern: stop the failed query, [[bootstrap]] the grown
  * graph into the SAME table (the marker resets to −1), and resume
  * [[maintain]] with a FRESH checkpoint directory (spec-pinned
  * end-to-end).
  *
  * Scale posture: per batch, the fold's rounds are ball-sized (or
  * the priced recompute on a scattered batch), and the persisted
  * state write is the honest floor — the new |E| relation and
  * (iterations+1)·|V| trajectory rows must land on storage
  * regardless of how they were derived. Snapshots are auto-vacuumed
  * inside the batch (retain `keepSnapshots` — the keep-N rule means
  * a reader pinned within the last N generations always survives),
  * so the table never accumulates one directory per batch forever. */
object GraphRankStream {

  private val RelEdge = "edge"
  private val RelTraj = "traj"
  private val RelPpr = "ptraj"
  private val RelLabel = "label"
  private val RelMeta = "meta"

  /** The maintained pack plus its watermark: `appliedBatch` is the
    * last folded foreachBatch epoch (−1 after bootstrap). PPR and
    * labels are present iff [[bootstrap]] was given seeds /
    * `withComponents`. */
  case class RankState(traj: DataFrame, pprTraj: Option[DataFrame],
                       labels: Option[DataFrame], edgesDeg: DataFrame,
                       appliedBatch: Long, iterations: Int)

  /** Pack and publish the full state pack as the next snapshot — one
    * atomic pointer swap for every relation. */
  def publish(tableDir: String, traj: DataFrame,
              pprTraj: Option[DataFrame], labels: Option[DataFrame],
              edgesDeg: DataFrame, batchId: Long,
              iterations: Int): Long = {
    def trajRows(rel: String, t: DataFrame) =
      t.select(lit(rel).as("rel"), col("node").as("a"),
        col("iter").cast("long").as("b"), col("pr").as("c"))
    val packed = edgesDeg.select(lit(RelEdge).as("rel"),
        col("src").as("a"), col("dst").as("b"), col("deg").as("c"))
      .unionByName(trajRows(RelTraj, traj))
      .unionByName(pprTraj.map(trajRows(RelPpr, _))
        .getOrElse(traj.limit(0).select(lit(RelPpr).as("rel"),
          col("node").as("a"), col("iter").cast("long").as("b"),
          col("pr").as("c"))))
      .unionByName(labels.map(l => l.select(lit(RelLabel).as("rel"),
          col("doc_id").as("a"), col("cluster_id").as("b"),
          lit(0L).as("c")))
        .getOrElse(edgesDeg.limit(0).select(lit(RelLabel).as("rel"),
          col("src").as("a"), col("dst").as("b"), lit(0L).as("c"))))
      .unionByName(edgesDeg.sparkSession.range(1)
        .select(lit(RelMeta).as("rel"), lit(batchId).as("a"),
          lit(iterations.toLong).as("b"), lit(0L).as("c")))
    Snapshots.publish(packed, tableDir)
  }

  /** Backward-compatible pair publish (plain PageRank only). */
  def publish(tableDir: String, traj: DataFrame, edgesDeg: DataFrame,
              batchId: Long, iterations: Int): Long =
    publish(tableDir, traj, None, None, edgesDeg, batchId, iterations)

  /** Read the current snapshot back as the typed pack. The returned
    * frames are pinned to the snapshot directory current at resolve
    * time (Snapshots isolation). Family presence is decided by a
    * relation having rows — a maintained family is never empty (the
    * universe is non-empty by bootstrap's contract). */
  def readState(spark: SparkSession, tableDir: String): RankState = {
    val packed = Snapshots.read(spark, tableDir)
      .localCheckpoint(eager = true)
    val meta = packed.filter(col("rel") === RelMeta)
      .select("a", "b").head()
    def traj(rel: String) = packed.filter(col("rel") === rel)
      .select(col("a").as("node"), col("b").cast("int").as("iter"),
        col("c").as("pr"))
    val ppr = traj(RelPpr)
    val labels = packed.filter(col("rel") === RelLabel)
      .select(col("a").as("doc_id"), col("b").as("cluster_id"))
    RankState(
      traj(RelTraj),
      if (ppr.isEmpty) None else Some(ppr),
      if (labels.isEmpty) None else Some(labels),
      packed.filter(col("rel") === RelEdge)
        .select(col("a").as("src"), col("b").as("dst"),
          col("c").as("deg")),
      meta.getLong(0), meta.getLong(1).toInt)
  }

  /** Fix the node universe and publish the initial pack from a batch
    * graph. `seeds` turns on PPR maintenance (teleport mass on the
    * seed slice, denominated by the universe it fixes);
    * `withComponents` turns on label maintenance. Re-bootstrapping
    * an EXISTING table is the universe-migration move: the marker
    * resets to −1 and a fresh-checkpoint [[maintain]] resumes from
    * epoch 0. Returns the snapshot id. */
  def bootstrap(pairs: DataFrame, tableDir: String,
                iterations: Int = 5, seeds: Option[DataFrame] = None,
                withComponents: Boolean = false): Long = {
    val st = GraphOps.pageRankEdgeState(pairs)
    val traj = GraphOps.pageRankTrajectoryFromEdges(st, iterations)
    val ppr = seeds.map(s =>
      GraphOps.pprTrajectoryFromEdges(st, s, iterations))
    val labels =
      if (withComponents) Some(GraphOps.connectedComponents(pairs))
      else None
    publish(tableDir, traj, ppr, labels, st, batchId = -1L, iterations)
  }

  /** The served plain ranks: iterate `iterations` of the current
    * snapshot. */
  def currentRanks(spark: SparkSession, tableDir: String): DataFrame = {
    val st = readState(spark, tableDir)
    st.traj.filter(col("iter") === st.iterations).select("node", "pr")
  }

  /** The served PPR ranks; refuses if the pack maintains none. */
  def currentPprRanks(spark: SparkSession, tableDir: String): DataFrame = {
    val st = readState(spark, tableDir)
    val pt = st.pprTraj.getOrElse(throw new IllegalStateException(
      s"$tableDir maintains no PPR trajectory — bootstrap with seeds"))
    pt.filter(col("iter") === st.iterations).select("node", "pr")
  }

  /** The served component labels; refuses if the pack maintains
    * none. */
  def currentLabels(spark: SparkSession, tableDir: String): DataFrame =
    readState(spark, tableDir).labels.getOrElse(
      throw new IllegalStateException(
        s"$tableDir maintains no labels — bootstrap withComponents"))

  /** A live maintainer lease: the OS file lock's channel plus the
    * query it protects (set once started). Cross-process exclusion
    * comes from the OS lock (freed with the process — no staleness);
    * same-JVM exclusion from this map. A lease whose query has
    * TERMINATED but whose async listener hasn't fired yet is
    * releasable at acquire time — `stop()` returns before the
    * listener bus drains, and a stop-then-restart must not falsely
    * refuse. */
  private final class Lease(val ch: FileChannel) {
    @volatile var query: StreamingQuery = _
  }
  private val leases =
    new java.util.concurrent.ConcurrentHashMap[String, Lease]()

  private def acquireLease(tableDir: String): (String, Lease) = {
    java.nio.file.Files.createDirectories(Paths.get(tableDir))
    val key = Paths.get(tableDir).toAbsolutePath.normalize.toString
    val prior = leases.get(key)
    if (prior != null) {
      val q = prior.query
      if (q != null && !q.isActive) releaseLease(key, prior)
    }
    val ch = FileChannel.open(
      Paths.get(key, "_maintainer.lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock: FileLock =
      try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
    val lease = new Lease(ch)
    if (lock == null || leases.putIfAbsent(key, lease) != null) {
      ch.close()
      throw new IllegalStateException(
        s"GraphRankStream: another maintain() holds the writer lease " +
          s"on $key — a second concurrent maintainer would interleave " +
          "read-fold-publish and lose updates; stop it first")
    }
    (key, lease)
  }

  /** Release `expected`'s lease only if it is still the registered
    * one — a lagging listener for an OLD query must never evict the
    * lease a NEW maintain just took. */
  private def releaseLease(key: String, expected: Lease): Unit =
    if (leases.remove(key, expected))
      try expected.ch.close() // closing the channel releases the lock
      catch { case _: Throwable => () }

  /** Start the maintenance query over an edge stream. `edges` needs
    * columns (id1, id2) and optionally `op` ∈ {"add", "del"} — no op
    * column means every row is an addition; a NULL or unknown op
    * REFUSES the batch (never guesses a sign). Each micro-batch
    * folds signed through the maintained pack (every family the
    * bootstrap turned on, off one shared state scan) and publishes
    * atomically; the epoch guard is three-way (see the object doc).
    * After each publish the table is vacuumed down to
    * `keepSnapshots` generations. Pass `checkpointDir` for
    * restartable consumption — without it, a restart can only
    * resume a table whose marker is still −1. */
  def maintain(edges: DataFrame, tableDir: String,
               checkpointDir: Option[String] = None,
               keepSnapshots: Int = 4): StreamingQuery = {
    val (leaseKey, lease) = acquireLease(tableDir)
    val spark0 = edges.sparkSession
    try {
      var w = edges.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          val spark = batch.sparkSession
          val st = readState(spark, tableDir)
          if (epoch < st.appliedBatch)
            throw new IllegalStateException(
              s"GraphRankStream: foreachBatch epoch $epoch < applied " +
                s"marker ${st.appliedBatch} — the stream restarted " +
                "without its original checkpointLocation, so folding " +
                "would silently drop batches; restore the checkpoint " +
                "or re-bootstrap the table")
          if (epoch > st.appliedBatch) {
            val b = batch.localCheckpoint(eager = true)
            val hasOp = b.columns.contains("op")
            if (hasOp) {
              val bad = b.filter(col("op").isNull ||
                !col("op").isin("add", "del")).count()
              if (bad > 0L)
                throw new IllegalArgumentException(
                  s"GraphRankStream: $bad row(s) with op outside " +
                    "{add, del} (or NULL) — refusing the batch rather " +
                    "than guessing a sign")
            }
            val adds =
              if (hasOp) b.filter(col("op") === "add").select("id1", "id2")
              else b.select("id1", "id2")
            val dels =
              if (hasOp) b.filter(col("op") === "del").select("id1", "id2")
              else b.select("id1", "id2").limit(0)
            val (traj2, ppr2, labels2, st2) = GraphOps.graphStatesFold(
              st.traj, st.pprTraj, st.labels, st.edgesDeg, adds, dels,
              st.iterations)
            publish(tableDir, traj2, ppr2, labels2, st2, epoch,
              st.iterations)
            Snapshots.vacuum(tableDir, keep = keepSnapshots)
          }
          ()
        }
      checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
      val q = w.start()
      lease.query = q
      // release the lease when THIS query terminates (stop or crash);
      // the listener self-removes after firing
      val qid = q.id
      spark0.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == qid) {
            releaseLease(leaseKey, lease)
            spark0.streams.removeListener(this)
          }
      })
      q
    } catch {
      case t: Throwable => releaseLease(leaseKey, lease); throw t
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.GraphOps

/** Fold-vs-recompute pricing for the graph IVM ranking family — the
  * measurement VERDICT r13 ordered (item 1a): `graph_pagerank_delta`'s
  * bench row prices the DEMO (trajectory rebuilt in-query + an
  * adversarially scattered delta); the operator's actual claim is
  * "fold ≪ recompute when the delta is local and the trajectory is
  * amortized state", and nothing measured that. This harness does,
  * on the same honest soak fixtures as `graft.Soak`:
  *
  *  - the STATE PAIR (trajectory + `pageRankEdgeState`) is built
  *    once per (fixture, shape) and pinned — amortized state,
  *    exactly how `graph_components_delta`'s prior labeling is
  *    priced;
  *  - the FOLD (`pageRankDeltaFromState`: delta-sized checks,
  *    capped ball probe, touched-sized degree maintenance,
  *    ball-restricted rounds — the per-batch production cost) is
  *    timed INTERLEAVED with the from-scratch recompute
  *    (`pageRank` on the union), F,S,F,S, min-of-reps;
  *  - delta shapes per fixture: CONCENTRATED (edges inside a
  *    deterministic slice of components — the deployment shape,
  *    ball ≪ graph, takes the restricted-fold branch), BROAD (a
  *    coarser slice — break-even territory), and SCATTERED (the
  *    bench fixture's %101 split — ball covers the graph, takes the
  *    priced recompute branch, expected ratio ≈ 1 plus the probe);
  *  - round 15: DELETION rows (`del_*`, `ppr_del_*`) price the
  *    signed fold — the full-graph pair is the amortized state, the
  *    slice is retracted, the anchor is from-scratch over the
  *    survivors.
  *
  * Round 16 (VERDICT r15 item 1): the harness load-gates BETWEEN
  * TIMED REPS the way the bench gates its start — the r15 soak runs
  * started clean but ended at loadavg 17-23, leaving the PPR
  * deletion fold's 30× point noise-bound (rep arrays 2.8-3.5× wide).
  * Before each timed measurement the harness waits (bounded) for the
  * 1-minute load to drop under SPARK_GRAFT_SOAK_MAX_LOAD (default 8);
  * total gate waits are annotated in the artifact, and a rep that
  * STARTS gated is loud on stderr. SPARK_GRAFT_SOAKFOLD_ONLY
  * (comma-separated shape-name substrings) restricts the measured
  * rows for targeted re-runs.
  *
  * Usage: runMain graft.SoakFold [baseDir] [soakedDir] [jsonOut]
  * (soakedDir must already exist — generate it with graft.Soak;
  * pass the 30× directory for the decade point the r14 verdict
  * ordered.) */
object SoakFold {

  private val maxLoad = sys.env.get("SPARK_GRAFT_SOAK_MAX_LOAD")
    .map(_.toDouble).getOrElse(8.0)
  private val maxWaitS = sys.env.get("SPARK_GRAFT_SOAK_MAX_WAIT_S")
    .map(_.toInt).getOrElse(300)
  private var gateWaitedS = 0
  private var gatedReps = 0

  /** Wait (bounded) for the 1-minute load to clear the gate before a
    * timed rep — the bench's start gate applied per-measurement. */
  private def loadGate(): Unit = {
    var waited = 0
    while (load1() > maxLoad && waited < maxWaitS) {
      Thread.sleep(5000); waited += 5
    }
    gateWaitedS += waited
    if (load1() > maxLoad) {
      gatedReps += 1
      System.err.println(
        f"[soakfold] WARNING: rep starts GATED at loadavg ${load1()}%.1f" +
          f" > $maxLoad%.1f after ${waited}s wait")
    }
  }

  /** SPARK_GRAFT_SOAK_DISK_CKPT=1 pins state through RELIABLE disk
    * checkpoints instead of in-heap localCheckpoint blocks — the 100×
    * fixture's pinned relations (pairs, labels, full state pair, PPR
    * trajectory, survivors) exceed any single-JVM heap as MEMORY_AND_
    * DISK blocks (observed: hard OOM at 64g), and a real cluster
    * would hold maintained state on distributed storage anyway.
    * GraphOps.materialize switches itself the same way once the
    * session has a checkpoint dir, so BOTH sides of every ratio (fold
    * and from-scratch anchor) run the same storage policy. */
  private val diskCkpt: Boolean =
    sys.env.get("SPARK_GRAFT_SOAK_DISK_CKPT").exists(_ == "1")

  private def pin(df: DataFrame): DataFrame =
    if (diskCkpt) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  private def timeOne(df: => DataFrame): Double = {
    loadGate()
    System.gc()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Comma-separated substrings restricting which rows run — the
    * targeted-re-run lever (e.g. "del_tight,ppr_del" re-measures just
    * the deletion folds). A term starting with '=' matches the row
    * name EXACTLY (the add-tight rows are substrings of the del-tight
    * rows, so only an exact form can select them alone — needed to
    * split the 100× run across two driver sessions for heap room).
    * Absent = every row. */
  private val only: Option[Seq[String]] =
    sys.env.get("SPARK_GRAFT_SOAKFOLD_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  private def rowOn(name: String): Boolean =
    only.forall(_.exists(t =>
      if (t.startsWith("=")) name == t.drop(1) else name.contains(t)))

  /** (shape, foldReps, scratchReps, |delta|, |ball-side prior|) for
    * both delta shapes on one fixture directory. */
  private def measure(spark: SparkSession, dir: String,
                      passes: Int): Seq[(String, Seq[Double], Seq[Double], Long)] = {
    val pairs = Dedup.simhashPairs(Tables.documents(spark, dir))
      .select("id1", "id2").transform(pin)

    // component-sliced deltas: cluster ids are component-minimum
    // doc ids; an edge's endpoints share a component, so one-sided
    // membership decides the edge and the 5-hop ball can never
    // leave the slice
    val labels = GraphOps.connectedComponents(pairs)
      .transform(pin)
    def compSlice(mod: Int): DataFrame = {
      val picked = labels.filter(col("cluster_id") % mod === 0)
        .select("doc_id")
      pairs.join(picked.withColumnRenamed("doc_id", "id1"), Seq("id1"),
          "left_semi")
        .filter((col("id1") + col("id2")) % 3 === 0)
    }
    // first modulus in the chain yielding a non-empty slice — the
    // deterministic fallback for fixtures with few clusters (ADVICE
    // r14: the broad shape reuses this instead of a hardcoded 59
    // that a valid fixture could miss)
    def firstNonEmpty(mods: Seq[Int]): Option[(Int, DataFrame)] =
      mods.iterator.map(m => (m, compSlice(m)))
        .find(_._2.limit(1).count() > 0)

    def shapes: Seq[(String, DataFrame)] = {
      // TIGHT: the deployment shape — a daily delta touching a FEW
      // components (~0.1% of cluster ids; coarser moduli fall back)
      val (tm, tight) = firstNonEmpty(Seq(997, 199, 59))
        .getOrElse(throw new IllegalStateException(
          "no component slice yields a delta — fixture bug"))
      // BROAD: a ~2% cluster slice (ball = a large minority of nodes
      // — the fold's break-even territory); skipped with a log line
      // when no coarse modulus hits (never aborts the harness)
      val broad = firstNonEmpty(Seq(59, 19, 7)).map {
        case (m, df) => s"broad_mod$m" -> df }
      if (broad.isEmpty)
        System.err.println(s"[soakfold] $dir: no broad slice — row skipped")
      // SCATTERED: the bench fixture's %101 slice (majority ball —
      // prices the incremental recompute branch)
      val scat = pairs.filter((col("id1") + col("id2")) % 101 === 0)
      Seq(s"tight_mod$tm" -> tight) ++ broad.toSeq ++
        Seq("scattered" -> scat)
    }

    // DELETION rows (VERDICT r14 item 3): the signed fold priced on
    // its own deployment shape — the full-graph state pair is the
    // amortized input, the tight slice is RETRACTED, and the price
    // anchor is a from-scratch pageRank over the survivors (same |E|
    // to within the slice; the fold additionally keeps stranded
    // nodes, which the anchor's edge-derived node set drops — a
    // timing non-event). Full-graph pair built ONCE per fixture.
    val addShapes = shapes
    // lazy: a SPARK_GRAFT_SOAKFOLD_ONLY run that selects no deletion
    // row never builds the full-graph pair
    lazy val stFull = GraphOps.pageRankEdgeState(pairs)
    lazy val trajFull = GraphOps.pageRankTrajectoryFromEdges(stFull,
      iterations = 5).transform(pin)
    lazy val nodesFull = pairs.select(col("id1").as("n"))
      .unionByName(pairs.select(col("id2").as("n"))).distinct()
      .transform(pin)
    // FLOOR rows (VERDICT r16 item 2): the deletion fold's output is
    // the merged (iterations+1)·|V| trajectory plus the survivor |E|
    // state, each materialized through the same pin policy the fold
    // itself uses — time an IDENTITY pass of each (read the pinned
    // relation, write it back through pin(); no ball rounds, no
    // joins) so the irreducible state-write floor is MEASURED and the
    // fold's margin can be decomposed into floor + incremental
    // compute. Reported with fold == scratch == floor time (ratio 1
    // by construction; the number, not the ratio, is the datum).
    def timeFloorOf(df: => DataFrame): Double = {
      loadGate()
      System.gc()
      val t0 = System.nanoTime()
      pin(df) // eager: materializes every row through the pin policy
      (System.nanoTime() - t0) / 1e9
    }
    val floorRows = {
      val wantTraj = rowOn("floor_traj_write")
      val wantEdges = rowOn("floor_edges_write")
      val tRow =
        if (!wantTraj) Seq.empty
        else {
          val r = (1 to passes).map(_ =>
            timeFloorOf(trajFull.select("node", "iter", "pr")))
          Seq(("floor_traj_write", r, r, 0L))
        }
      val eRow =
        if (!wantEdges) Seq.empty
        else {
          val r = (1 to passes).map(_ =>
            timeFloorOf(stFull.select("src", "dst", "deg")))
          Seq(("floor_edges_write", r, r, 0L))
        }
      tRow ++ eRow
    }
    val delRows = addShapes.filterNot(_._1.startsWith("broad"))
      .flatMap { case (shape, delta0) =>
        val wantPr = rowOn(s"del_$shape")
        val wantPpr = shape != "scattered" && rowOn(s"ppr_del_$shape")
        if (!wantPr && !wantPpr) Seq.empty
        else {
          val delta = delta0.transform(pin)
          val nDelta = delta.count()
          val survivors = pairs.join(delta, Seq("id1", "id2"), "left_anti")
            .transform(pin)
          val prRow =
            if (!wantPr) Seq.empty
            else {
              val r = (1 to passes).map { _ =>
                val f = timeOne(GraphOps.pageRankDelete(trajFull, stFull,
                  delta, iterations = 5))
                val s = timeOne(GraphOps.pageRank(survivors, iterations = 5))
                (f, s)
              }
              Seq((s"del_$shape", r.map(_._1), r.map(_._2), nDelta))
            }
          val pprRow =
            if (!wantPpr) Seq.empty
            else {
              val seeds = nodesFull.filter(col("n") % 7 === 0)
                .select(col("n").as("node")).transform(pin)
              val ptraj = GraphOps.pprTrajectoryFromEdges(stFull, seeds,
                iterations = 5).transform(pin)
              val r = (1 to passes).map { _ =>
                val f = timeOne(GraphOps.pprDelete(ptraj, stFull, delta,
                  seeds, iterations = 5))
                val s = timeOne(GraphOps.personalizedPageRank(survivors,
                  seeds, iterations = 5))
                (f, s)
              }
              Seq((s"ppr_del_$shape", r.map(_._1), r.map(_._2), nDelta))
            }
          prRow ++ pprRow
        }
      }

    addShapes.map { case (shape, delta0) =>
      val wantAdd = rowOn(shape)
      val wantPpr = !shape.startsWith("broad") && rowOn(s"ppr_$shape")
      if (!wantAdd && !wantPpr) Seq.empty
      else {
      val prior = pairs.join(delta0, Seq("id1", "id2"), "left_anti")
        .transform(pin)
      val nodes0 = prior.select(col("id1").as("n"))
        .unionByName(prior.select(col("id2").as("n"))).distinct()
      // node-preserving contract: both endpoints must survive in prior
      val delta = delta0
        .join(nodes0.withColumnRenamed("n", "id1"), Seq("id1"), "left_semi")
        .join(nodes0.withColumnRenamed("n", "id2"), Seq("id2"), "left_semi")
        .transform(pin)
      val nDelta = delta.count()
      require(nDelta > 0, s"$shape delta is empty on $dir — fixture bug")
      // amortized state PAIR: trajectory + edge-degree state, built
      // ONCE, outside every timed rep — the production shape. The
      // edge state is recurrence-agnostic, so the PPR rows reuse it.
      val st = GraphOps.pageRankEdgeState(prior)
      val addRows =
        if (!wantAdd) Seq.empty
        else {
          val traj = GraphOps.pageRankTrajectoryFromEdges(st, iterations = 5)
            .transform(pin)
          val reps = (1 to passes).map { _ =>
            val f = timeOne(GraphOps.pageRankDeltaFromState(traj, st, delta,
              iterations = 5))
            val s = timeOne(GraphOps.pageRank(prior.unionByName(delta),
              iterations = 5))
            (f, s)
          }
          Seq((shape, reps.map(_._1), reps.map(_._2), nDelta))
        }
      // PPR twin on the SAME fixture/shape (tight + scattered only —
      // broad is pagerank's break-even probe): seeds = every 7th
      // graph node, as the graph_ppr family queries
      val pprRows =
        if (!wantPpr) Seq.empty
        else {
          val seeds = nodes0.filter(col("n") % 7 === 0)
            .select(col("n").as("node")).transform(pin)
          val ptraj = GraphOps.pprTrajectoryFromEdges(st, seeds,
            iterations = 5).transform(pin)
          val r = (1 to passes).map { _ =>
            val f = timeOne(GraphOps.pprDeltaFromState(ptraj, st, delta,
              seeds, iterations = 5))
            val s = timeOne(GraphOps.personalizedPageRank(
              prior.unionByName(delta), seeds, iterations = 5))
            (f, s)
          }
          Seq((s"ppr_$shape", r.map(_._1), r.map(_._2), nDelta))
        }
      addRows ++ pprRows
      }
    }.flatten ++ delRows ++ floorRows
  }

  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val soaked = args.lift(1).getOrElse("target/soak/sf1")
    val jsonOut = args.lift(2)
    val passes = sys.env.get("SPARK_GRAFT_SOAK_PASSES")
      .map(_.toInt).getOrElse(3)
    // disk-checkpoint mode: the cleaner property must be in the
    // SparkConf BEFORE the context starts (checkpoint files of GC'd
    // RDDs are then deleted — a 100× run writes tens of GB of state
    // pins and would fill the disk otherwise)
    if (diskCkpt)
      System.setProperty(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    val spark = GraftSession.get()
    if (diskCkpt) {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_soakfold_ckpt").toString
      spark.sparkContext.setCheckpointDir(ckpt)
      System.err.println(s"[soakfold] disk-checkpoint mode: $ckpt")
    }
    require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(soaked, "documents.parquet")),
      s"soaked fixture $soaked missing — generate it with graft.Soak first")
    // warm codegen/JIT on the small scale before any timed pass
    Seq("graph_pagerank", "graph_pagerank_delta").foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    val loadStart = load1()
    println("| fixture | shape | fold s | scratch s | fold/scratch |")
    println("|---|---|---|---|---|")
    val results = Seq("base" -> base, "soaked" -> soaked).map {
      case (tag, dir) =>
        val rows = measure(spark, dir, passes)
        rows.foreach { case (shape, f, s, n) =>
          println(f"| $tag | $shape (delta $n) | ${f.min}%.2f | ${s.min}%.2f | ${f.min / s.min}%.2f |")
        }
        tag -> rows
    }
    val loadEnd = load1()
    jsonOut.foreach { path =>
      def arr(v: Seq[Double]) = v.map(t => f"$t%.3f").mkString("[", ", ", "]")
      val rows = results.flatMap { case (tag, rs) =>
        rs.map { case (shape, f, s, n) =>
          f"""    "${tag}_$shape": {"n_delta": $n, "fold_s": ${f.min}%.3f, "scratch_s": ${s.min}%.3f, "fold_over_scratch": ${f.min / s.min}%.3f, "fold_reps": ${arr(f)}, "scratch_reps": ${arr(s)}}"""
        }
      }.mkString(",\n")
      val onlyJson = only.map(_.mkString("\"", ",", "\"")).getOrElse("null")
      val json =
        s"""{
           |  "base": "$base",
           |  "soaked": "$soaked",
           |  "passes": $passes,
           |  "only": $onlyJson,
           |  "trajectory": "amortized (built once per shape, localCheckpointed, outside all timed reps)",
           |  "fold_includes": "delta checks + capped ball BFS + touched-sized degree maintenance + ball-restricted rounds over maintained (traj, edgesDeg) state",
           |  "loadavg": {"start": $loadStart, "end": $loadEnd},
           |  "load_gate": {"max_load": $maxLoad, "per_rep": true, "gate_waited_s": $gateWaitedS, "reps_started_gated": $gatedReps},
           |  "disk_ckpt": $diskCkpt,
           |  "rows": {
           |$rows
           |  }
           |}
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      System.err.println(s"[soakfold] wrote $path")
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the second
  * graph family next to Dedup.nearDupClusters (label propagation).
  * PageRank here scores nodes of the near-dup similarity graph:
  * within a duplicate cluster the highest-rank node is the natural
  * canonical representative (most-connected copy), a standard
  * curation signal when picking which duplicate to KEEP.
  *
  * All arithmetic is scaled-integer with floor division, so every
  * iteration is engine-exact and partitioning-invariant: no float
  * accumulation, no rounding-mode ambiguity — the DuckDB oracle
  * replays the identical recurrence and the gate hash-matches.
  *
  * Scale posture (100 TB): each iteration is one join of the edge
  * list against the rank vector (both partitioned by src) plus one
  * groupBy(dst) — the canonical distributed PageRank shape; the edge
  * list is materialized ONCE up front so the (possibly expensive)
  * pair-producing pipeline doesn't re-execute per round, and each
  * round's rank vector is materialized to truncate lineage (reliable
  * checkpoint when a checkpoint dir is set, localCheckpoint
  * otherwise — same policy as Dedup). The node count enters as a
  * 1-row broadcast aggregate (crossJoin idiom), never a driver
  * collect. */
object GraphOps {

  /** See Dedup.materialize — same tradeoff, same policy. */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Lineage-truncating checkpoint whose blocks materialize inside
    * the FIRST consumer's job instead of a standalone eager action —
    * the [[bfsRoundsAgg]] idiom generalized (round 17, guide §1/§2).
    * Same storage, same truncation, same once-computed blocks for
    * every later reader (concurrent readers of an unmaterialized
    * block serialize on the block lock, so work is never doubled);
    * what it removes is one full AQE action — result-stage + driver
    * round-trip — per checkpoint, which the phase profile
    * (AbGraphParts) measured as the iterative families' floor at
    * bench scale: the per-round compute is tiny next to the fixed
    * per-action overhead, and a 5-iterate trajectory paid 6 such
    * actions where one final action materializes the same blocks.
    * Use [[materialize]] only where a driver probe (count/head)
    * follows immediately anyway, or where eagerness is the point. */
  private def lazyMat(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Fixed-iteration PageRank over an UNDIRECTED edge list `pairs`
    * (columns id1, id2; symmetrized and deduplicated internally).
    * Returns (node, pr) where pr is the rank scaled by `scale`:
    * pr₀ = scale/n, prₖ₊₁(v) = (scale·(1−d))/n + d·Σᵤ→ᵥ prₖ(u)/deg(u),
    * d = dampNum/dampDen, every division a floor division.
    *
    * The rank lineage is a CHAIN (each prₖ feeds only prₖ₊₁), so
    * per-round materialization would only add a full job per round —
    * instead the edge list materializes once and the rank vector only
    * every `checkpointEvery` rounds, bounding both plan depth and the
    * recomputation a lost executor could trigger at scale.
    *
    * Executes under the SESSION'S OWN conf — pageRank mutates no
    * session state, so it is reentrant and safe next to concurrent
    * queries (a library operator's obligation; the round-8 version
    * toggled session-global AQE off for its iterations and was
    * neither).
    *
    * The AQE history, so it is not re-litigated: round 8 measured
    * AQE-off winning the iterations at sf1 (11.8 vs 21.2 s, min of
    * TWO) and shipped a session-global toggle; the round-8 bench then
    * regressed at sf0.1 (2.79 → 3.65 s). Round 9 re-measured both
    * scales with 3-4 interleaved reps per shape (graft.AbPagerank):
    * sf0.1 = AQE-on 2.62 / AQE-off 3.51; sf1 = AQE-on 12.11 /
    * AQE-off 12.77 — the sf1 "win" did not reproduce (its AQE-on rep
    * was co-tenant noise), and scoping the flip to an isolated twin
    * session costs ~1.4 s (sf0.1) to ~6 s (sf1) of per-call session
    * overhead on top. AQE-inherit wins or ties everywhere, with zero
    * conf mutation; ARCHITECTURE §7 carries the full table. */
  def pageRank(pairs: DataFrame, iterations: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "pageRank: need at least one iteration")
    require(dampNum > 0 && dampNum < dampDen, "pageRank: need 0 < damp < 1")
    require(checkpointEvery >= 1, "pageRank: checkpointEvery must be >= 1")
    // materialize the INPUT first: `pairs` is typically an expensive
    // mining pipeline (LSH band expansion), and it appears twice in
    // the symmetrizing union — and `edges` twice more in the degree
    // self-join below. Without this the miner executed 4× before the
    // first checkpoint (round-6 soak: pagerank 16.0 s → the fix's
    // re-measure in ARCHITECTURE §7).
    val pairsM = lazyMat(pairs.select(col("id1"), col("id2")))
    pageRankLoop(pairsM, iterations, dampNum, dampDen, scale,
      checkpointEvery)
  }

  /** Symmetrized (src, dst, deg) relation, materialized hash-
    * partitioned on src — degree travels WITH each edge: one
    * materialized relation means each rank round is a single join +
    * a single groupBy (the division per edge row recomputes a
    * per-src constant, free next to the exchange it avoids), and the
    * checkpointed src layout means every round's join satisfies its
    * distribution from storage, so only the rank vector — |V| rows,
    * not |E| — crosses the wire per round. */
  private def edgesWithDegree(pairsM: DataFrame): DataFrame = {
    val edges = pairsM.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairsM.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
    // lazy since round 17: the consuming loop's first action (the
    // node count) materializes the state in-job — same blocks, one
    // less standalone action
    lazyMat(edges.as("e")
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")).as("g"), "src")
      .repartition(col("src")))
  }

  private def pageRankLoop(pairsM: DataFrame, iterations: Int,
                           dampNum: Long, dampDen: Long, scale: Long,
                           checkpointEvery: Int): DataFrame =
    pageRankLoopFromEdges(edgesWithDegree(pairsM), iterations,
      dampNum, dampDen, scale, checkpointEvery)

  private def pageRankLoopFromEdges(edgesDeg: DataFrame, iterations: Int,
                                    dampNum: Long, dampDen: Long,
                                    scale: Long,
                                    checkpointEvery: Int): DataFrame = {
    // n_nodes enters as a COUNTED LITERAL (round 17): the former
    // 1-row broadcast-aggregate crossJoin re-built its broadcast
    // exchange on every downstream action (one extra job each —
    // AbLoopVariants measured the literal form at 26 vs 40 jobs for
    // the 5-iterate trajectory twin); the count is a metadata-sized
    // driver read of the already-checkpointed edge state, the same
    // class of probe as teleportVector's seed count. Floor division
    // of nonneg longs in Scala == SQL `div`, so every rank value is
    // bit-identical (AbLoopVariants' exceptAll gate).
    val nNodes = edgesDeg.select(col("src").as("node")).distinct().count()
    if (nNodes == 0L)
      // empty graph: zero-row result, same schema/behavior as before
      return materialize(edgesDeg.select(col("src").as("node"),
        col("deg").as("pr")).limit(0))
    // alias-qualified join inside (see pageRankLoopN): after round 1
    // the rank vector's lineage contains edgesDeg itself, so
    // unqualified Dataset-column references would be ambiguous
    // self-join attributes. Every node of an undirected graph has
    // in-edges, so the groupBy(dst) covers the full node set.
    //
    // shuffle_hash PINNED on the rank-vector side (here and in every
    // ranking loop): this chained plan carries no runtime stats, so
    // the static estimator can shrink a mid-chain intermediate under
    // the broadcast threshold and the planner then BUILDS an
    // |V|+-scale hashed relation on the driver — observed as a
    // driver OOM on the 30× soak fixture (round 16), and at 100 TB
    // the rank vector is billions of rows, so a broadcast there can
    // never be right. The hint forces the designed shape: edges
    // satisfy the join's distribution from their checkpointed src
    // layout, only the |V|-row vector crosses the wire, and the
    // per-task build side is |V|/partitions.
    pageRankLoopN(edgesDeg, nNodes, iterations, dampNum, dampDen, scale,
      checkpointEvery)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
    * "Connected components in MapReduce and beyond", SoCC 2014) —
    * the O(log n)-round labeling that [[graft.dedup.Dedup
    * .nearDupClusters]]'s min-label propagation is NOT: min-label
    * needs one round per unit of component DIAMETER, so a
    * chain-shaped component (URL redirect chains, citation paths,
    * doc-revision lineages) of length d costs d shuffles — at 100 TB
    * a 10⁴-long chain is a job that never finishes. The star
    * operations contract every component onto its minimum in rounds
    * logarithmic in component SIZE regardless of shape:
    *
    *  - **large-star** (per node u): point every LARGER neighbor at
    *    u's minimum neighborhood label m(u) = min(Γ(u) ∪ {u}) —
    *    `⋃_u {(m(u), v) : v ∈ Γ(u), v > u}`.
    *  - **small-star** (per node u over its SMALLER neighbors S):
    *    point u and all of S at m = min(S) —
    *    `⋃_u {(m, v) : v ∈ (S ∪ {u}) \ {m}}`.
    *
    * Both preserve connectivity exactly (proved in the paper); the
    * unique fixpoint is a forest of stars rooted at each component's
    * minimum id, read off as the label relation. Every round is two
    * groupBy/join rounds over the current edge set — plain shuffles
    * AQE can re-split on skew, nothing driver-side but the
    * convergence Boolean.
    *
    * Same output contract as nearDupClusters: (doc_id, cluster_id =
    * component-minimum id) for every id appearing in `pairs`. Use
    * nearDupClusters for KNOWN-shallow graphs (near-dup clusters —
    * one shuffle per round beats two when diameter ≤ 3); use this
    * when component shape is unknown or adversarial. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // materialize the INPUT once — `pairs` is typically a mining
    // pipeline, and it feeds BOTH the node set (self-pairs label
    // themselves even though the loop-free edge set drops them) and
    // the edge canonicalization; without this the miner executed
    // twice (same lesson as pageRank's input materialize)
    val pairsM = materialize(pairs.select(col("id1"), col("id2")))
    val nodes = pairsM.select(col("id1").as("doc_id"))
      .unionByName(pairsM.select(col("id2").as("doc_id"))).distinct()
    var e = materialize(canonicalEdges(pairsM))
    var converged = isMinRootedStarForest(e)
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: neighbors of u with v > u attach to m(u)
      val nbrs = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val lsMin = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // m ≤ u < v, so (m, v) is already canonical and loop-free
      val ls = nbrs.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b")).distinct()
      // small-star: direct high→low; u and its smaller neighbors S
      // all attach to min(S). Row-wise over (u, v ∈ S): the row
      // holding the minimum contributes (m, u), every other row
      // (m, v) — exactly (S ∪ {u}) \ {m}.
      val dn = ls.select(col("b").as("u"), col("a").as("v"))
      val ssMin = dn.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = dn.join(ssMin, "u")
        .select(col("m").as("a"),
          when(col("v") === col("m"), col("u")).otherwise(col("v")).as("b"))
        .distinct()
      val newE = materialize(ss)
      converged = isMinRootedStarForest(newE)
      e = newE
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters alternating " +
          "rounds (pathological — expected O(log n); raise maxIters)")
    // the fixpoint is a star forest rooted at component minima: each
    // non-root appears exactly once as b; roots (and isolated nodes)
    // label themselves
    nodes.join(e.select(col("b").as("doc_id"), col("a").as("root")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("cluster_id"))
  }

  /** Personalized PageRank: importance RELATIVE to a trusted seed
    * set. Same integer recurrence as [[pageRank]] but the teleport
    * mass lands only on seeds — tele(v) = scale/|S| for in-graph
    * seeds, 0 elsewhere; pr₀ = tele, prₖ₊₁(v) = ((dampDen−dampNum)·
    * tele(v)) div dampDen + (dampNum·Σᵤ→ᵥ prₖ(u)/deg(u)) div dampDen,
    * every division a floor division so both engines agree bit-
    * for-bit.
    *
    * The curation read: [[bfsHops]] grades proximity in HOPS —
    * binary per ring, blind to how many independent paths connect a
    * doc to the trusted set. PPR weights multiplicity and closeness
    * together (the standard TrustRank/spam-mass construction:
    * Gyöngyi, Garcia-Molina & Pedersen, "Combating web spam with
    * TrustRank", VLDB 2004), so a doc similar to MANY trusted docs
    * outranks one hanging off a single thread, and mass decays
    * geometrically with distance.
    *
    * Scale posture: identical to pageRank — the (src, dst, deg,
    * tele_dst) relation checkpoints once hash-partitioned on src and
    * rounds shuffle only the |V|-row rank vector. The teleport mass
    * is FUSED into that checkpointed edge layout (tele(dst) rides
    * each edge row; the per-dst aggregate reads it back with a max),
    * so every round is ONE join + ONE aggregate — round 9 shipped a
    * per-round tele join by node instead, and soak measured it at
    * 5.6× on 10× data, the steepest of the graph family, exactly the
    * extra |V|-row exchange per round this fusion removes. Throws if
    * no seed is in the graph (PPR is undefined without teleport
    * mass). */
  def personalizedPageRank(pairs: DataFrame, seeds: DataFrame,
                           iterations: Int = 10,
                           dampNum: Long = 85, dampDen: Long = 100,
                           scale: Long = 1000000000000L,
                           checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "personalizedPageRank: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "personalizedPageRank: need 0 < damp < 1")
    require(checkpointEvery >= 1,
      "personalizedPageRank: checkpointEvery must be >= 1")
    val pairsM = lazyMat(pairs.select(col("id1"), col("id2")))
    val edgesDeg = edgesWithDegree(pairsM)
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val tele = teleportVector(nodes, seeds, scale, "personalizedPageRank")
    // one-time fusion: tele(dst) onto the edge layout, re-partitioned
    // back on src (the per-round join key). Costs one edge-sized join
    // + checkpoint at setup; saves one |V|-row tele join PER ROUND —
    // the round-9 soak's 5.6× row. groupBy(dst) covers every node
    // (the graph is symmetrized, so all nodes have in-edges), and
    // tele_dst is constant per dst group, read back with max().
    val edgesTele = teleFusedEdges(edgesDeg, tele)
    pprLoopFromEdges(edgesTele, tele, iterations, dampNum, dampDen,
      checkpointEvery)
  }

  /** (src, dst, deg, tele_dst) — the teleport mass fused onto the
    * degree-carrying edge layout, re-partitioned back on the
    * per-round join key and materialized (the round-10 fusion: one
    * edge-sized join at setup saves one |V|-row tele join PER
    * ROUND). */
  private def teleFusedEdges(edgesDeg: DataFrame,
                             tele: DataFrame): DataFrame =
    lazyMat(
      edgesDeg.join(
          tele.select(col("node").as("dst"), col("tele").as("tele_dst")),
          Seq("dst"))
        .repartition(col("src")))

  private def pprLoopFromEdges(edgesTele: DataFrame, tele: DataFrame,
                               iterations: Int, dampNum: Long,
                               dampDen: Long,
                               checkpointEvery: Int): DataFrame = {
    var pr = tele.select(col("node"), col("tele").as("pr"))
    for (i <- 1 to iterations) {
      pr = edgesTele.as("e").join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"),
          max(col("e.tele_dst")).as("tele"))
        .select(col("dst").as("node"),
          (expr(s"((${dampDen - dampNum}) * tele) div $dampDen") +
            expr(s"($dampNum * in_sum) div $dampDen")).as("pr"))
      if (i % checkpointEvery == 0 && i < iterations) pr = materialize(pr)
    }
    // lazy result checkpoint (round 17): still lineage-free for the
    // caller; the caller's first action materializes it without the
    // standalone eager job
    lazyMat(pr)
  }

  /** The iterate TRAJECTORY of [[pageRank]] as maintainable state:
    * (node, iter, pr) for iter = 0..`iterations` of the exact
    * integer recurrence, iterate `iterations` being the served rank.
    * The trajectory — not just the final vector — is what makes an
    * edge delta foldable ([[pageRankDelta]]): a fixed-iteration rank
    * is NOT a fixpoint, so re-deriving iterate i of the modified
    * graph needs iterate i−1 of the OLD graph on every node the
    * delta hasn't reached yet. State is (iterations+1)·|V| rows —
    * the bounded-state bargain [[graft.operators.Cdc.topkShadowState]]
    * strikes with k′ shadow rows, struck here with the iterate axis.
    *
    * Each iterate materializes (it is output, so the per-round job
    * [[pageRank]] avoids is the honest cost of state building);
    * the rank recurrence, tie-free integer arithmetic, and plan
    * shape per round are IDENTICAL to [[pageRank]] — iterate
    * `iterations` of this relation equals pageRank's output row for
    * row, which the spec pins. */
  def pageRankTrajectory(pairs: DataFrame, iterations: Int = 10,
                         dampNum: Long = 85, dampDen: Long = 100,
                         scale: Long = 1000000000000L): DataFrame =
    pageRankTrajectoryFromEdges(
      pageRankEdgeState(pairs), iterations, dampNum, dampDen, scale)

  /** The symmetrized (src, dst, deg) relation as PUBLIC maintainable
    * state — the second half of the incremental-PageRank state pair
    * next to [[pageRankTrajectory]]. A pipeline that keeps BOTH can
    * fold a delta through [[pageRankDeltaFromState]] paying only
    * SCANS of this relation plus touched-sized degree fixes, never
    * the union symmetrize + distinct + degree self-join +
    * repartition exchange chain this builder runs (SOAK_r14_fold
    * measured that setup chain as the fold's whole floor: with it
    * re-run per batch, fold ≈ recompute even on a concentrated
    * delta). Build once per graph, feed every consumer. */
  def pageRankEdgeState(pairs: DataFrame): DataFrame =
    edgesWithDegree(lazyMat(pairs.select(col("id1"), col("id2"))))

  /** [[pageRankTrajectory]] over a PREBUILT [[pageRankEdgeState]] —
    * the sharing seam: a demo (or production state build) that
    * needs the edge state anyway must not pay the degree build
    * twice. */
  def pageRankTrajectoryFromEdges(edgesDeg: DataFrame,
                                  iterations: Int = 10,
                                  dampNum: Long = 85, dampDen: Long = 100,
                                  scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "pageRankTrajectory: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "pageRankTrajectory: need 0 < damp < 1")
    // round 17 (guide §1/§2, AbLoopVariants A/B): n as a counted
    // literal (kills the per-action broadcast rebuild of the old
    // 1-row crossJoin side) and LAZY per-iterate checkpoints — the
    // first consumer action (every fold starts with a full-trajectory
    // probe aggregate) materializes all iterate blocks in ONE job
    // where the eager form paid one action per iterate. 40 → 21 jobs
    // for the 5-iterate build, values bit-identical (exceptAll gate).
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val nNodes = nodes.count()
    val tp = if (nNodes == 0L) 0L
      else (scale * (dampDen - dampNum)) / dampDen / nNodes
    var pr = lazyMat(nodes.select(col("node"),
      lit(if (nNodes == 0L) 0L else scale / nNodes).as("pr")))
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      pr = lazyMat(
        edgesDeg.as("e").join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
          .groupBy(col("e.dst"))
          .agg(sum(expr("pr div deg")).as("in_sum"))
          .select(col("dst").as("node"),
            (lit(tp) +
              expr(s"($dampNum * in_sum) div $dampDen")).as("pr")))
      iterates :+= pr.withColumn("iter", lit(i))
    }
    iterates.reduce(_ unionByName _).select("node", "iter", "pr")
  }

  /** Incremental [[pageRank]]: fold a node-preserving edge delta
    * into a [[pageRankTrajectory]] WITHOUT re-running the per-round
    * |E|-sized joins — the IVM family's ranking member, next to the
    * additive `aggDelta`, the fixpoint [[componentsDelta]], and the
    * bounded-state `topkFold`. Returns (node, pr) EQUAL row for row
    * to `pageRank(prevPairs ∪ newPairs)` (the spec and the
    * `graph_pagerank_delta` oracle both check against the
    * from-scratch recompute on the union graph).
    *
    * Why it's exact — the ball argument: with additions only, the
    * set of nodes whose iterate i can differ from the old trajectory
    * is Aᵢ = the i-hop ball around T = endpoints(newPairs). A₀ = T
    * (only degrees changed there), and Aᵢ = Aᵢ₋₁ ∪ N(Aᵢ₋₁): a node v
    * outside Aᵢ has no neighbor in Aᵢ₋₁ ⊇ T, so every in-neighbor u
    * keeps deg_old(u) = deg_new(u) AND its old iterate i−1 — v's
    * iterate i is bit-identical by induction. The fold therefore
    * recomputes iterates only INSIDE the growing ball (reading
    * old-trajectory values at the ball's rim) and merges iterate
    * `iterations` back over the untouched rows.
    *
    * Contract: the delta must not add nodes — a new node changes
    * n_nodes, which moves EVERY node's teleport term and the ball is
    * the whole graph; the fold REFUSES loudly (rerun from scratch or
    * segment). Delta edges already present in the prior graph are
    * absorbed exactly (the union re-derives degrees), they only
    * waste ball. Deletions fold through [[pageRankDelete]] /
    * [[pageRankDeltaSigned]] (round 15 — the node universe stays the
    * trajectory's, so n_nodes never moves).
    *
    * Scale shape (100 TB), measured, not argued: setup is the same
    * one-exchange symmetrize + degree build as from-scratch (the
    * fact pass is unavoidable — degrees of touched nodes changed),
    * plus a BFS ball computation seeded at T (frontier-sized rounds,
    * [[bfsRoundsAgg]]). The fold then restricts ONCE: the edge
    * relation semi-joins to the max ball and MATERIALIZES
    * (`edgesBall`), and the trajectory restricts to that relation's
    * source set (`trajBall` — the only old iterates any round
    * reads), so every round is a ball-sized join + ball-sized
    * aggregate, each round's output materialized (rounds are
    * output-sized, the same honest policy as
    * [[pageRankTrajectory]]'s per-iterate cut; the round-13 version
    * chained all rounds into one job over the FULL |E| relation with
    * only the aggregate semi-restricted, and benched 3.2× the
    * recompute). The win is proportional to delta locality, so the
    * fold PRICES IT: the ball probe bails the moment the ball
    * reaches a majority of the node set (the BFS counts each round
    * anyway, so the cap is free and skips the |V|-sized late rounds
    * a scattered delta would pay), and the fold machinery is
    * abandoned for the from-scratch loop on the already-built degree
    * relation (exact by the operator's own contract: the fold's
    * defining property IS equality with from-scratch on the union,
    * so the branch is a plan choice, never a semantics choice).
    * A CONCENTRATED delta
    * (a few components touched — the operator's deployment shape)
    * takes the ball-restricted fold, priced by SOAK_r14; a delta
    * whose endpoints scatter across components (the bench fixture's
    * %101 split, deliberately adversarial) takes the recompute
    * branch and pays from-scratch plus the ball probe, never fold
    * overhead on a graph-sized ball. */
  def pageRankDelta(prevTraj: DataFrame, prevPairs: DataFrame,
                    newPairs: DataFrame, iterations: Int = 10,
                    dampNum: Long = 85, dampDen: Long = 100,
                    scale: Long = 1000000000000L): DataFrame =
    // self-contained form: rebuild the prior edge state in-line and
    // fold through the state-based path — a caller that MAINTAINS
    // the state (the production shape) calls
    // [[pageRankDeltaFromState]] directly and skips this build
    pageRankDeltaFromState(prevTraj, pageRankEdgeState(prevPairs),
      newPairs, iterations, dampNum, dampDen, scale)

  /** [[pageRankDelta]] against MAINTAINED state — the production
    * fold. `prevEdgesDeg` is the prior graph's
    * [[pageRankEdgeState]]; with it in hand the fold's setup is
    * SCAN-ONLY: degrees move only at delta endpoints, so the
    * degree maintenance is a delta-sized aggregate plus one
    * broadcast-filtered scan for the touched nodes' old degrees —
    * never the union symmetrize + distinct + degree self-join +
    * repartition + checkpoint chain the self-contained form pays
    * (SOAK_r14_fold measured that chain as the whole fold floor:
    * self-contained fold ≈ recompute at 10× even concentrated).
    * Everything else is as [[pageRankDelta]]: the capped ball probe,
    * the majority-ball recompute branch (which also builds its full
    * degree relation incrementally — one scan + broadcast fix), the
    * ball-restricted per-round-materialized fold, and the final
    * merge. Delta edges already present in the state are absorbed
    * exactly: the anti-join drops them from the new-edge set, so
    * degrees never double-count. Additions only; deletions fold
    * through [[pageRankDelete]] / [[pageRankDeltaSigned]]. */
  def pageRankDeltaFromState(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                             newPairs: DataFrame, iterations: Int = 10,
                             dampNum: Long = 85, dampDen: Long = 100,
                             scale: Long = 1000000000000L): DataFrame =
    pageRankSignedCore(prevTraj, prevEdgesDeg, newPairs,
      newPairs.limit(0), iterations, dampNum, dampDen, scale,
      wantTrajectory = false, maybeDeletes = false)._1

  /** EDGE DELETIONS for the ranking fold — the maintenance law the
    * additions-only forms declare out of scope, closed the way
    * [[componentsDelete]] closed it for components, with one crucial
    * difference of LAW: an edge deletion never deletes a document,
    * so the NODE UNIVERSE IS THE TRAJECTORY'S, forever. A node whose
    * last edge is deleted stays in the output at its teleport-only
    * rank ((scale·(1−d)) div dampDen div n from iterate 1 on), keeps
    * its trajectory rows, and can be re-connected by a later
    * addition — which is exactly what makes delete-then-re-add an
    * identity (spec-pinned). n_nodes therefore NEVER moves on a
    * deletion, and the ball induction of [[pageRankDelta]] carries
    * over signed: a deleted edge perturbs exactly its endpoints (a
    * degree decrement + a lost in-mass term), so the set of nodes
    * whose iterate i can change is still the i-hop ball around the
    * changed endpoints — under the UNION of old and new edges, since
    * a lost in-neighbor is still a neighbor of the ball in the OLD
    * graph. Equality contract: row-for-row equal to the recurrence
    * over (prevPairs − deletedPairs) on the PRIOR node set — the
    * `graph_pagerank_delete` oracle's from-scratch derivation.
    * Deleted edges that never existed are tolerated (ignored, as in
    * [[componentsDelete]]). */
  def pageRankDelete(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                     deletedPairs: DataFrame, iterations: Int = 10,
                     dampNum: Long = 85, dampDen: Long = 100,
                     scale: Long = 1000000000000L): DataFrame =
    pageRankSignedCore(prevTraj, prevEdgesDeg, deletedPairs.limit(0),
      deletedPairs, iterations, dampNum, dampDen, scale,
      wantTrajectory = false, maybeDeletes = true)._1

  /** The SIGNED fold: additions and deletions in one pass, under the
    * survivor law `(prior − deleted) ∪ added` (an edge both deleted
    * and re-added in the same batch nets to "present, degree
    * unchanged"). Returns the final (node, pr) over the trajectory's
    * node universe. See [[pageRankDelete]] for the deletion law and
    * [[pageRankDeltaFromState]] for the additions economics — this
    * is both at once, one ball, one branch decision. */
  def pageRankDeltaSigned(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                          addedPairs: DataFrame, deletedPairs: DataFrame,
                          iterations: Int = 10,
                          dampNum: Long = 85, dampDen: Long = 100,
                          scale: Long = 1000000000000L): DataFrame =
    pageRankSignedCore(prevTraj, prevEdgesDeg, addedPairs, deletedPairs,
      iterations, dampNum, dampDen, scale,
      wantTrajectory = false, maybeDeletes = true)._1

  /** Maintain the full state PAIR through a signed delta: returns
    * (trajectory′, edgeState′) — the inputs for the NEXT fold, which
    * is what a streaming consumer
    * ([[graft.streaming.GraphRankStream]]) persists per micro-batch.
    * The trajectory updates per iterate (ball-sized overrides merged
    * over the old iterates on the fold branch; a from-scratch
    * trajectory loop over the incrementally-built survivor state on
    * the majority branch), and the edge state is rebuilt as ONE scan
    * of the prior state (gone rows anti-joined away, touched degrees
    * broadcast-patched) plus the genuinely-new rows — the honest
    * floor of persisting state: the new |E| relation must be written
    * anyway, so the fold's output-sized-rounds economics apply to the
    * trajectory, not the state scan. */
  def pageRankStateFold(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                        addedPairs: DataFrame, deletedPairs: DataFrame,
                        iterations: Int = 10,
                        dampNum: Long = 85, dampDen: Long = 100,
                        scale: Long = 1000000000000L)
      : (DataFrame, DataFrame) = {
    val (traj, st) = pageRankSignedCore(prevTraj, prevEdgesDeg,
      addedPairs, deletedPairs, iterations, dampNum, dampDen, scale,
      wantTrajectory = true, maybeDeletes = true)
    (traj, st.get)
  }

  /** Shared engine of the plain-PageRank folds. Verifies the state
    * pair (it refuses rather than trusts — the stateful-fold
    * posture), prices locality with the capped ball probe, then
    * either folds ball-restricted or recomputes on the
    * incrementally-built survivor state. Driver actions before the
    * rounds: the fused it0 probe (|V| + uniformity — iterate 0 of a
    * plain trajectory is scale div n EVERYWHERE, so a stored min or
    * max off that value means the pair isn't this graph's) and
    * [[prepSigned]]'s fused probe (added-nodes / state-extra-nodes /
    * broadcast-envelope sizes, one aggregate — VERDICT r15 item 5). Returns (result, updated edge state) —
    * the state only when the branch built it ([[pageRankStateFold]]
    * always does; the tip fold only on the majority branch). */
  private def pageRankSignedCore(prevTraj: DataFrame,
                                 prevEdgesDeg: DataFrame,
                                 addedPairs: DataFrame,
                                 deletedPairs: DataFrame,
                                 iterations: Int, dampNum: Long,
                                 dampDen: Long, scale: Long,
                                 wantTrajectory: Boolean,
                                 maybeDeletes: Boolean)
      : (DataFrame, Option[DataFrame]) = {
    require(iterations >= 1, "pageRankDelta: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "pageRankDelta: need 0 < damp < 1")
    // NOT materialized yet: the recompute branch reads the
    // trajectory only for the checks — the fold path, which reads
    // it per round, pays the checkpoint
    val traj0 = prevTraj.select("node", "iter", "pr")
    val it0 = traj0.filter(col("iter") === 0)
    // fused it0 + DEPTH probe (ADVICE r16): |V| and iterate-0
    // uniformity as before, PLUS max(iter) == iterations — a stored
    // trajectory shallower than the requested depth would leave the
    // fold's per-iterate merges silently empty past the stored tip
    // (and the tip fold reading a non-final iterate); deeper would
    // silently serve a stale interior iterate as the tip. Same single
    // driver action — the aggregate just reads the whole trajectory
    // (which the filter scan did anyway).
    val h = traj0.agg(
      count(when(col("iter") === 0, 1)).as("n"),
      min(when(col("iter") === 0, col("pr"))).as("mn"),
      max(when(col("iter") === 0, col("pr"))).as("mx"),
      max(col("iter")).as("depth")).head()
    val nNodes = h.getLong(0)
    if (nNodes == 0L)
      throw new IllegalArgumentException(
        "pageRankDelta: prevTraj has no iterate-0 rows — not a " +
          "pageRankTrajectory")
    if (h.getLong(1) != scale / nNodes || h.getLong(2) != scale / nNodes)
      throw new IllegalArgumentException(
        s"pageRankDelta: trajectory iterate 0 is not uniformly " +
          s"scale div n (min=${h.getLong(1)}, max=${h.getLong(2)}, " +
          s"expected ${scale / nNodes}) — the trajectory belongs to " +
          "a different graph or scale; rerun pageRankTrajectory")
    if (h.getInt(3) != iterations)
      throw new IllegalArgumentException(
        s"pageRankDelta: the stored trajectory holds ${h.getInt(3)} " +
          s"iterations but the fold was asked for $iterations — a " +
          "mismatched (trajectory, iterations) pair would silently " +
          "merge against missing or non-final iterates; pass the " +
          "depth the trajectory was built with")
    val p = prepSigned(it0, prevEdgesDeg, addedPairs, deletedPairs,
      maybeDeletes, "pageRankDelta")
    // capped ball probe over prior ∪ new edges: deleted edges are
    // still prior edges, so the union reaches the old in-neighbors a
    // deletion perturbs (see pageRankDelete's signed induction)
    val edgesAll = prevEdgesDeg.select("src", "dst")
      .unionByName(p.dNew.select("src", "dst"))
    // lazy: the ball probe's first count materializes hop0 (and the
    // prep's lazy checkpoints behind it) in one job
    val hop0 = lazyMat(
      p.endsChanged.select(col("node").as("doc_id"), lit(0).as("hops")))
    val (ball0, majority) =
      bfsRoundsAggCapped(edgesAll, hop0, iterations, (nNodes + 1L) / 2L)
    logBranch("pageRankDelta", majority)
    // the per-node teleport term, a literal (n_nodes is pinned to
    // the trajectory's universe — deletions never shrink it)
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    if (majority) {
      val st = survivorEdgeState(prevEdgesDeg, p)
      if (wantTrajectory)
        (pageRankTrajLoopN(st, it0.select("node"), nNodes, iterations,
          dampNum, dampDen, scale), Some(st))
      else {
        val ranks = pageRankLoopN(st, nNodes, iterations,
          dampNum, dampDen, scale)
        // node-universe merge: nodes stranded by deletions keep
        // their teleport-only rank
        (lazyMat(it0.select(col("node"))
          .join(ranks, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("pr"), lit(tp)).as("pr"))), Some(st))
      }
    } else {
      // minority ball: commit to the fold — materialize the complete
      // ball (it gates every round's scan and aggregate). The FULL
      // trajectory is checkpointed only when the caller wants the
      // merged trajectory back (pageRankStateFold — the per-iterate
      // merge reads every stored iterate): the tip-only folds read
      // the stored trajectory exactly twice more after the probe
      // (the ball-restricted iterate-0 seed and the final-tip merge),
      // and both reads restrict or filter BEFORE any shuffle, so
      // re-scanning the caller's pinned state is strictly cheaper
      // than writing (iterations+1)·|V| rows to checkpoint storage
      // first (SOAK_r16_fold_100x: that write was the fold's
      // residual floor — VERDICT r16 item 2)
      // ball0 is already a counted lazy checkpoint from the probe
      // (blocks materialized, lineage cut) — no second copy
      val ball = ball0
      val traj = if (wantTrajectory) lazyMat(traj0) else traj0
      val ballMax = ball.select(col("doc_id").as("node"))
      val edgesBall = ballEdges(prevEdgesDeg, p, ballMax)
      // the only nodes whose OLD iterates any round reads are
      // edgesBall's sources (in-neighbors of ball nodes); restrict
      // the (iterations+1)·|V| trajectory to that set once, then
      // VERIFY the restriction covers it — a trajectory from a
      // different graph silently dropping in-neighbor contributions
      // is the one mismatch the global probes can't see (ADVICE r14)
      val srcBall = edgesBall.select(col("src").as("node")).distinct()
      val trajBall = lazyMat(
        traj.join(srcBall, Seq("node"), "left_semi"))
      ballCoverageCheck(srcBall, trajBall, "pageRankDelta")
      val rounds = ballRounds(traj, trajBall, ball, edgesBall,
        iterations, dampNum, dampDen,
        (ballI, inSums) => ballI.join(inSums, Seq("node"), "left")
          .select(col("node"),
            (lit(tp) + expr(s"($dampNum * coalesce(in_sum, " +
              s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
      if (wantTrajectory) {
        val merged = lazyMat((0 to iterations).map { i =>
          val base = traj.filter(col("iter") === i)
          if (i == 0) base // iterate 0 is delta-invariant
          else base.as("o")
            .join(rounds(i - 1).as("n"), Seq("node"), "left")
            .select(col("node"), col("iter"),
              coalesce(col("n.pr"), col("o.pr")).as("pr"))
        }.reduce(_ unionByName _))
        (merged, Some(survivorEdgeState(prevEdgesDeg, p)))
      } else
        // merge: untouched rows keep iterate `iterations` verbatim
        (lazyMat(
          traj.filter(col("iter") === iterations).as("o")
            .join(rounds.last.as("n"), Seq("node"), "left")
            .select(col("node"),
              coalesce(col("n.pr"), col("o.pr")).as("pr"))), None)
    }
  }

  /** [[pageRankLoopFromEdges]] with n_nodes as a LITERAL instead of
    * an edge-derived aggregate — the recompute branch of the signed
    * folds must keep the TRAJECTORY's node count when deletions have
    * stranded nodes out of the edge relation (the caller merges the
    * stranded teleport-only rows back). */
  private def pageRankLoopN(edgesDeg: DataFrame, nNodes: Long,
                            iterations: Int, dampNum: Long,
                            dampDen: Long, scale: Long,
                            checkpointEvery: Int = 5): DataFrame = {
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    var pr = edgesDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(scale / nNodes).as("pr"))
    for (i <- 1 to iterations) {
      pr = edgesDeg.as("e").join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(tp) + expr(s"($dampNum * in_sum) div $dampDen")).as("pr"))
      if (i % checkpointEvery == 0 && i < iterations) pr = materialize(pr)
    }
    // lazy result checkpoint (round 17): lineage-free, materialized
    // by the caller's first action
    lazyMat(pr)
  }

  /** Trajectory loop over the node UNIVERSE with a literal n —
    * [[pageRankStateFold]]'s majority branch. Every iterate keeps one
    * row per universe node (stranded nodes at the teleport constant),
    * so the produced state obeys the same invariants the fold
    * verifies on input. */
  private def pageRankTrajLoopN(edgesDeg: DataFrame, nodesAll: DataFrame,
                                nNodes: Long, iterations: Int,
                                dampNum: Long, dampDen: Long,
                                scale: Long): DataFrame = {
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    // lazy per-iterate checkpoints (round 17) — see
    // pageRankTrajectoryFromEdges
    var pr = lazyMat(
      nodesAll.select(col("node"), lit(scale / nNodes).as("pr")))
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      val inSums = edgesDeg.as("e")
        .join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .select(col("dst").as("node"), col("in_sum"))
      pr = lazyMat(nodesAll.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (lit(tp) + expr(s"($dampNum * coalesce(in_sum, " +
            s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
      iterates :+= pr.withColumn("iter", lit(i))
    }
    iterates.reduce(_ unionByName _).select("node", "iter", "pr")
  }

  /** The iterate TRAJECTORY of [[personalizedPageRank]] as
    * maintainable state: (node, iter, pr) for iter = 0..`iterations`
    * of the exact integer PPR recurrence, iterate `iterations` being
    * the served rank — the PPR twin of [[pageRankTrajectory]], and
    * the state [[pprDelta]] folds an edge delta into. Iterate 0 IS
    * the teleport vector (scale/|S| on in-graph seeds, 0 elsewhere),
    * which is what lets the fold VERIFY the caller's seed set
    * against the state instead of trusting it. Same tele-fused edge
    * layout, same refusal on a seedless graph, and iterate
    * `iterations` equals personalizedPageRank's output row for row
    * (spec-pinned). */
  def pprTrajectory(pairs: DataFrame, seeds: DataFrame,
                    iterations: Int = 10,
                    dampNum: Long = 85, dampDen: Long = 100,
                    scale: Long = 1000000000000L): DataFrame =
    pprTrajectoryFromEdges(pageRankEdgeState(pairs), seeds,
      iterations, dampNum, dampDen, scale)

  /** [[pprTrajectory]] over a PREBUILT [[pageRankEdgeState]] — the
    * same sharing seam as [[pageRankTrajectoryFromEdges]] (the edge
    * relation is graph state, agnostic of which ranking recurrence
    * reads it, so PPR and plain PageRank share ONE build). */
  def pprTrajectoryFromEdges(edgesDeg: DataFrame, seeds: DataFrame,
                             iterations: Int = 10,
                             dampNum: Long = 85, dampDen: Long = 100,
                             scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "pprTrajectory: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "pprTrajectory: need 0 < damp < 1")
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val tele = teleportVector(nodes, seeds, scale, "pprTrajectory")
    val edgesTele = teleFusedEdges(edgesDeg, tele)
    // lazy per-iterate checkpoints (round 17) — see
    // pageRankTrajectoryFromEdges; one consumer action materializes
    // the whole pack instead of one eager action per iterate
    var pr = tele.select(col("node"), col("tele").as("pr"))
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      pr = lazyMat(
        edgesTele.as("e").join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
          .groupBy(col("e.dst"))
          .agg(sum(expr("pr div deg")).as("in_sum"),
            max(col("e.tele_dst")).as("tele"))
          .select(col("dst").as("node"),
            (expr(s"((${dampDen - dampNum}) * tele) div $dampDen") +
              expr(s"($dampNum * in_sum) div $dampDen")).as("pr")))
      iterates :+= pr.withColumn("iter", lit(i))
    }
    iterates.reduce(_ unionByName _).select("node", "iter", "pr")
  }

  /** (node, tele) teleport vector over `nodes` for `seeds`:
    * scale/|S∩V| on in-graph seeds, 0 elsewhere; refuses loudly on a
    * seedless graph. One small count action (|S∩V| enters the
    * integer division as a literal). Shared by the PPR family. */
  private def teleportVector(nodes: DataFrame, seeds: DataFrame,
                             scale: Long, who: String): DataFrame = {
    val seedCol = seeds.columns.head
    val seedNodes = nodes.join(
      seeds.select(col(seedCol).as("node")), Seq("node"), "left_semi")
    val nSeeds = seedNodes.count()
    if (nSeeds == 0L)
      throw new IllegalArgumentException(
        s"$who: no seed appears in the graph — teleport mass would " +
          "be undefined")
    lazyMat(
      nodes.join(seedNodes.withColumn("is_seed", lit(1L)), Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed").isNotNull, lit(scale / nSeeds))
            .otherwise(lit(0L)).as("tele")))
  }

  /** Incremental [[personalizedPageRank]]: fold a node-preserving
    * edge delta into a [[pprTrajectory]] — the seed-relative twin of
    * [[pageRankDelta]], closing the one graph row that had no IVM
    * answer (PPR soaked the steepest of the from-scratch family).
    * Returns (node, pr) EQUAL row for row to
    * `personalizedPageRank(prevPairs ∪ newPairs, seeds)` (the spec
    * and the `graph_ppr_delta` oracle both check against the
    * from-scratch recompute on the union graph).
    *
    * The ball argument CARRIES OVER UNCHANGED: the PPR recurrence
    * differs from pageRank's only in the teleport term, and tele(v)
    * is a per-node constant depending on the seed set alone — never
    * on n_nodes, degrees, or other nodes' iterates — so with
    * additions only and the node set preserved, a node outside the
    * i-hop ball of the delta endpoints keeps every in-neighbor's
    * degree, every in-neighbor's iterate i−1, AND its own teleport
    * term: iterate i is bit-identical by the same induction.
    *
    * Two contracts, both VERIFIED (not trusted), both loud:
    *  - node-preserving, as in [[pageRankDelta]] (a new NON-seed
    *    node would actually leave tele untouched, but the trajectory
    *    carries no iterate rows for it — one uniform family law
    *    beats a subtler one);
    *  - seed-consistent: the recurrence's teleport vector is encoded
    *    in the state as iterate 0, so the fold recomputes tele from
    *    `seeds` on the union graph and REFUSES if any row differs
    *    from the stored iterate 0 — a caller passing a different
    *    seed set (the silent-wrong-answer hazard of stateful folds)
    *    is caught by construction.
    *
    * Scale shape: identical to [[pageRankDelta]] — one |E|-row
    * semi-join materializes the ball-restricted TELE-FUSED edge
    * relation, the trajectory restricts to its source set, and every
    * round is a ball-sized join + aggregate, materialized per round.
    * Same locality economics AND the same priced branch: a majority
    * ball abandons the fold and reruns the from-scratch loop on the
    * already-built tele-fused relation (exact by the fold's own
    * equality contract). */
  def pprDelta(prevTraj: DataFrame, prevPairs: DataFrame,
               newPairs: DataFrame, seeds: DataFrame,
               iterations: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L): DataFrame =
    // self-contained form — production callers that maintain the
    // edge state fold through [[pprDeltaFromState]] directly
    pprDeltaFromState(prevTraj, pageRankEdgeState(prevPairs),
      newPairs, seeds, iterations, dampNum, dampDen, scale)

  /** [[pprDelta]] against MAINTAINED state — the PPR twin of
    * [[pageRankDeltaFromState]], same scan-only setup economics
    * (two-step broadcast anti for the new-edge set, touched-sized
    * degree maintenance, capped ball probe, incremental degree
    * build even on the majority-ball recompute branch). The
    * teleport vector is READ FROM THE STATE: iterate 0 IS tele, so
    * once the seed-consistency check passes (recompute the expected
    * tele values from `seeds` against iterate 0, FUSED with the
    * |S∩V| and |V| counts into ONE driver action — the fold's pitch
    * is per-batch latency, and actions are its floor) the fold
    * reuses the verified iterate-0 rows as its teleport relation
    * instead of paying the |E|-distinct a fresh teleportVector build
    * would need. Additions only; deletions fold through
    * [[pprDelete]] / [[pprDeltaSigned]]. */
  def pprDeltaFromState(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                        newPairs: DataFrame, seeds: DataFrame,
                        iterations: Int = 10,
                        dampNum: Long = 85, dampDen: Long = 100,
                        scale: Long = 1000000000000L): DataFrame =
    pprSignedCore(prevTraj, prevEdgesDeg, newPairs, newPairs.limit(0),
      seeds, iterations, dampNum, dampDen, scale, maybeDeletes = false,
      wantTrajectory = false)._1

  /** EDGE DELETIONS for the PPR fold — [[pageRankDelete]]'s law with
    * the seed-relative recurrence: the node universe is the
    * trajectory's (a stranded node keeps its teleport-only rank
    * ((dampDen−dampNum)·tele(v)) div dampDen from iterate 1 on —
    * zero off the seed set, so a stranded non-seed simply decays to
    * 0), tele(v) depends on the seed set alone and so NEVER moves on
    * a deletion, and the signed ball induction carries over
    * unchanged. Equality contract: the recurrence over
    * (prevPairs − deletedPairs) on the prior node set — the
    * `graph_ppr_delete` oracle's from-scratch derivation. */
  def pprDelete(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                deletedPairs: DataFrame, seeds: DataFrame,
                iterations: Int = 10,
                dampNum: Long = 85, dampDen: Long = 100,
                scale: Long = 1000000000000L): DataFrame =
    pprSignedCore(prevTraj, prevEdgesDeg, deletedPairs.limit(0),
      deletedPairs, seeds, iterations, dampNum, dampDen, scale,
      maybeDeletes = true, wantTrajectory = false)._1

  /** The SIGNED PPR fold: additions and deletions in one pass under
    * the survivor law `(prior − deleted) ∪ added` — see
    * [[pageRankDeltaSigned]]. */
  def pprDeltaSigned(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                     addedPairs: DataFrame, deletedPairs: DataFrame,
                     seeds: DataFrame, iterations: Int = 10,
                     dampNum: Long = 85, dampDen: Long = 100,
                     scale: Long = 1000000000000L): DataFrame =
    pprSignedCore(prevTraj, prevEdgesDeg, addedPairs, deletedPairs,
      seeds, iterations, dampNum, dampDen, scale, maybeDeletes = true,
      wantTrajectory = false)._1

  /** Maintain the full PPR state PAIR through a signed delta —
    * [[pageRankStateFold]]'s seed-relative twin (VERDICT r15 item 2:
    * the streaming seam hard-coded the plain recurrence because this
    * seam didn't exist). Returns (trajectory′, edgeState′): the
    * trajectory keeps ONE row per universe node per iterate
    * (stranded nodes at their teleport-only decay — zero off the
    * seed set), so the produced pair satisfies the same invariants
    * the fold verifies on input and keeps folding. The edge state is
    * the recurrence-agnostic [[pageRankEdgeState]] — callers
    * maintaining BOTH recurrences off one graph share one state
    * ([[graft.streaming.GraphRankStream]] folds both via
    * [[graphStatesFold]], which pays the shared setup once). */
  def pprStateFold(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                   addedPairs: DataFrame, deletedPairs: DataFrame,
                   seeds: DataFrame, iterations: Int = 10,
                   dampNum: Long = 85, dampDen: Long = 100,
                   scale: Long = 1000000000000L)
      : (DataFrame, DataFrame) = {
    val (traj, st) = pprSignedCore(prevTraj, prevEdgesDeg, addedPairs,
      deletedPairs, seeds, iterations, dampNum, dampDen, scale,
      maybeDeletes = true, wantTrajectory = true)
    (traj, st.get)
  }

  /** Fold ONE signed edge delta through EVERY maintained graph-state
    * family off one shared setup — the streaming seam's per-batch
    * engine (VERDICT r15 item 2: the edge state is shared by design,
    * so one `maintain` loop can fold both ranking trajectories plus
    * the components labels off one state scan). Returns
    * (plainTrajectory′, pprTrajectory′, labels′, edgeState′), each
    * family present iff its prior state was passed.
    *
    * What is PAID ONCE, regardless of how many families fold:
    * [[prepSigned]] (the delta reduced to genuinely-new/-gone rows,
    * touched degrees, fused structural probe), the capped ball
    * probe, the survivor edge-state scan, and — on the fold branch —
    * the ball-restricted edge relation.
    *
    * Persistence contract: on the RESTRICTED-FOLD branch the
    * returned trajectories and edge state are LAZY plans over the
    * caller's own prior state plus internally-materialized
    * ball-sized rounds — nothing full-pack-sized is checkpointed
    * here, because the one production consumer
    * ([[graft.streaming.GraphRankStream.maintain]]) immediately
    * persists the pack (touched partitions only) and pins its
    * INPUTS per family at read time; an extra checkpoint would
    * just write the full pack twice per batch (VERDICT r16 item 2).
    * A caller that reads the returned frames many times without
    * persisting them should pin them itself. The majority branch
    * returns loop outputs whose iterates are already materialized. Per extra family the
    * incremental cost is its own ball rounds (ball-sized joins) or
    * its own trajectory loop on the majority branch; the components
    * fold adds one scoped re-cluster (deletions) and/or one
    * label-star contraction (additions), each skipped when that side
    * of the delta is empty.
    *
    * Seed handling: the PPR teleport vector IS the PPR trajectory's
    * iterate 0 (verified non-degenerate and universe-consistent with
    * the plain trajectory in one fused action) — no caller-supplied
    * seed set, because the maintained pack is the source of truth
    * ([[pprStateFold]] is the standalone form that verifies a
    * caller's seeds).
    *
    * Labels law: the returned labeling equals
    * [[connectedComponents]] over the survivor graph, with nodes
    * stranded by deletions surviving as their own singletons — the
    * [[componentsDelete]] + [[componentsDelta]] composition under
    * the same survivor law `(prior − deleted) ∪ added` (an edge
    * deleted and re-added in one batch nets to present: the genuine
    * sets exclude it from both phases). */
  def graphStatesFold(prevPrTraj: DataFrame,
                      prevPprTraj: Option[DataFrame],
                      prevLabels: Option[DataFrame],
                      prevEdgesDeg: DataFrame,
                      addedPairs: DataFrame, deletedPairs: DataFrame,
                      iterations: Int = 10,
                      dampNum: Long = 85, dampDen: Long = 100,
                      scale: Long = 1000000000000L)
      : (DataFrame, Option[DataFrame], Option[DataFrame], DataFrame) = {
    val r = graphStatesFoldPack(prevPrTraj, prevPprTraj, prevLabels,
      prevEdgesDeg, addedPairs, deletedPairs, iterations, dampNum,
      dampDen, scale)
    (r.traj, r.pprTraj, r.labels, r.edgesDeg)
  }

  /** [[graphStatesFold]]'s result plus the fold's LOCALITY EVIDENCE:
    * `touched` is the ball node set when the restricted-fold branch
    * ran (every changed row of the trajectories and of the edge state
    * has its node / src in this set), or None when the majority
    * branch recomputed (everything may have changed). The streaming
    * pack writer uses it to republish only the storage partitions the
    * batch actually touched (VERDICT r16 item 8). Labels are NOT
    * ball-bounded — a component merge relabels nodes arbitrarily far
    * from the delta — so `touched` says nothing about them. */
  case class GraphFoldResult(traj: DataFrame, pprTraj: Option[DataFrame],
                             labels: Option[DataFrame],
                             edgesDeg: DataFrame,
                             touched: Option[DataFrame])

  /** [[graphStatesFold]] returning [[GraphFoldResult]] — same
    * semantics, same cost; the extra `touched` frame is the
    * fold-branch ball, already materialized for the rounds. */
  def graphStatesFoldPack(prevPrTraj: DataFrame,
                          prevPprTraj: Option[DataFrame],
                          prevLabels: Option[DataFrame],
                          prevEdgesDeg: DataFrame,
                          addedPairs: DataFrame, deletedPairs: DataFrame,
                          iterations: Int = 10,
                          dampNum: Long = 85, dampDen: Long = 100,
                          scale: Long = 1000000000000L)
      : GraphFoldResult = {
    require(iterations >= 1, "graphStatesFold: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "graphStatesFold: need 0 < damp < 1")
    val traj0 = prevPrTraj.select("node", "iter", "pr")
    val it0 = traj0.filter(col("iter") === 0)
    // fused it0 + DEPTH probe (ADVICE r16): also verify the stored
    // trajectory holds exactly `iterations` iterates — shallower and
    // the per-iterate merges go silently empty past the stored tip;
    // deeper and a stale interior iterate would serve as the tip
    val h = traj0.agg(
      count(when(col("iter") === 0, 1)).as("n"),
      min(when(col("iter") === 0, col("pr"))).as("mn"),
      max(when(col("iter") === 0, col("pr"))).as("mx"),
      max(col("iter")).as("depth")).head()
    val nNodes = h.getLong(0)
    if (nNodes == 0L)
      throw new IllegalArgumentException(
        "graphStatesFold: prevPrTraj has no iterate-0 rows — not a " +
          "pageRankTrajectory")
    if (h.getLong(1) != scale / nNodes || h.getLong(2) != scale / nNodes)
      throw new IllegalArgumentException(
        s"graphStatesFold: trajectory iterate 0 is not uniformly " +
          s"scale div n (min=${h.getLong(1)}, max=${h.getLong(2)}, " +
          s"expected ${scale / nNodes}) — the trajectory belongs to " +
          "a different graph or scale; re-bootstrap the pack")
    if (h.getInt(3) != iterations)
      throw new IllegalArgumentException(
        s"graphStatesFold: the stored trajectory holds ${h.getInt(3)} " +
          s"iterations but the fold was asked for $iterations — " +
          "re-bootstrap the pack or pass the pack's own depth")
    // PPR pack checks, ONE fused action: the stored iterate 0 IS the
    // teleport vector — verify it lives on the plain trajectory's
    // universe (same cardinality, no extra nodes), carries mass, and
    // holds the SAME depth (tip covers the universe, nothing deeper)
    val pprChecked = prevPprTraj.map { pt =>
      val ptraj0 = pt.select("node", "iter", "pr")
      val pit0 = ptraj0.filter(col("iter") === 0)
      val pc = pit0.select(lit("rows").as("k"))
        .unionByName(pit0.filter(col("pr") > 0)
          .select(lit("seeds").as("k")))
        .unionByName(pit0.join(it0.select("node"), Seq("node"), "left_anti")
          .select(lit("extra").as("k")))
        .unionByName(ptraj0.filter(col("iter") === iterations)
          .select(lit("tip").as("k")))
        .unionByName(ptraj0.filter(col("iter") > iterations)
          .select(lit("deep").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      if (pc.getOrElse("rows", 0L) != nNodes ||
          pc.getOrElse("extra", 0L) > 0L)
        throw new IllegalArgumentException(
          "graphStatesFold: the PPR trajectory's node universe " +
            "differs from the plain trajectory's — a mismatched " +
            "family pack; re-bootstrap")
      if (pc.getOrElse("seeds", 0L) == 0L)
        throw new IllegalArgumentException(
          "graphStatesFold: the PPR trajectory's iterate 0 carries " +
            "no teleport mass — not a pprTrajectory")
      if (pc.getOrElse("tip", 0L) != nNodes ||
          pc.getOrElse("deep", 0L) > 0L)
        throw new IllegalArgumentException(
          s"graphStatesFold: the PPR trajectory's depth differs from " +
            s"the requested $iterations iterations (tip rows: " +
            s"${pc.getOrElse("tip", 0L)} of $nNodes, deeper rows: " +
            s"${pc.getOrElse("deep", 0L)}) — a mismatched family " +
            "pack; re-bootstrap")
      ptraj0
    }
    val p = prepSigned(it0, prevEdgesDeg, addedPairs, deletedPairs,
      maybeDeletes = true, "graphStatesFold")
    val edgesAll = prevEdgesDeg.select("src", "dst")
      .unionByName(p.dNew.select("src", "dst"))
    val hop0 = materialize(
      p.endsChanged.select(col("node").as("doc_id"), lit(0).as("hops")))
    val (ball0, majority) =
      bfsRoundsAggCapped(edgesAll, hop0, iterations, (nNodes + 1L) / 2L)
    logBranch("graphStatesFold", majority)
    // the survivor state: built ONCE, read by every family and
    // returned as the pack's next edge state. Pinned only on the
    // majority branch (both trajectory loops read it per iterate);
    // on the restricted-fold branch the rounds read ballEdges, so the
    // full |E| relation's single consumer is the caller's persist —
    // lazy, the publisher's write materializes it exactly once
    val st = survivorEdgeState(prevEdgesDeg, p, pin = majority)
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    val (prTraj2, pprTraj2, touched) =
      if (majority)
        (pageRankTrajLoopN(st, it0.select("node"), nNodes, iterations,
          dampNum, dampDen, scale),
         pprChecked.map { pt =>
           val tele = materialize(pt.filter(col("iter") === 0)
             .select(col("node"), col("pr").as("tele")))
           pprTrajLoopN(st, tele, iterations, dampNum, dampDen)
         }, None)
      else {
        val ball = materialize(ball0)
        val ballMax = ball.select(col("doc_id").as("node"))
        // ball-restricted survivors: shared by both recurrences (the
        // edge relation is recurrence-agnostic)
        val edgesBall = ballEdges(prevEdgesDeg, p, ballMax)
        val srcBall = edgesBall.select(col("src").as("node")).distinct()
        // No full-trajectory checkpoints on the fold branch (VERDICT
        // r16 item 2): the stored trajectory is the caller's
        // MAINTAINED state (the streaming seam pins it per family at
        // read time), so re-scanning it per merged iterate beats
        // copying (iterations+1)·|V| rows to checkpoint storage
        // first; and the merged trajectory's one consumer is the
        // caller's persist (the publisher writes only the touched
        // buckets of it), so materializing it here would write the
        // full pack once extra per batch. Rounds and trajBall stay
        // materialized — they gate every round's join.
        def foldOne(t0: DataFrame, who: String,
                    assemble: (DataFrame, DataFrame) => DataFrame)
            : DataFrame = {
          val traj = t0
          val trajBall = materialize(
            traj.join(srcBall, Seq("node"), "left_semi"))
          ballCoverageCheck(srcBall, trajBall, who)
          val rounds = ballRounds(traj, trajBall, ball, edgesBall,
            iterations, dampNum, dampDen, assemble)
          (0 to iterations).map { i =>
            val base = traj.filter(col("iter") === i)
            if (i == 0) base // iterate 0 is delta-invariant
            else base.as("o")
              .join(rounds(i - 1).as("n"), Seq("node"), "left")
              .select(col("node"), col("iter"),
                coalesce(col("n.pr"), col("o.pr")).as("pr"))
          }.reduce(_ unionByName _)
        }
        val pr2 = foldOne(traj0, "graphStatesFold[pagerank]",
          (ballI, inSums) => ballI.join(inSums, Seq("node"), "left")
            .select(col("node"),
              (lit(tp) + expr(s"($dampNum * coalesce(in_sum, " +
                s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
        val ppr2 = pprChecked.map { pt =>
          val tele = materialize(pt.filter(col("iter") === 0)
            .select(col("node"), col("pr").as("tele")))
          foldOne(pt, "graphStatesFold[ppr]",
            (ballI, inSums) => tele.join(ballI, Seq("node"), "left_semi")
              .join(inSums, Seq("node"), "left")
              .select(col("node"),
                (expr(s"((${dampDen - dampNum}) * tele) div $dampDen") +
                  expr(s"($dampNum * coalesce(in_sum, " +
                    s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
        }
        // the ball bounds every changed trajectory row (both
        // recurrences merge only ball-node overrides) and every
        // changed edge-state row (degree patches and added/gone rows
        // all have src ∈ endsChanged ⊆ ball hop 0)
        (pr2, ppr2, Some(ballMax))
      }
    // components off the same genuine delta: scoped re-eval for the
    // gone side, label-star fold for the new side — each phase
    // skipped when its RAW delta side is empty (the genuine sets are
    // subsets, so an empty raw side proves an empty genuine side)
    val labels2 = prevLabels.map { lbl =>
      val afterDel =
        if (p.nDelRaw > 0L)
          componentsDelete(lbl,
            prevEdgesDeg.filter(col("src") < col("dst"))
              .select(col("src").as("id1"), col("dst").as("id2")),
            p.dGone.filter(col("src") < col("dst"))
              .select(col("src").as("id1"), col("dst").as("id2")))
        else lbl.select("doc_id", "cluster_id")
      if (p.nAddRaw > 0L)
        materialize(componentsDelta(afterDel,
          p.dNew.filter(col("src") < col("dst"))
            .select(col("src").as("id1"), col("dst").as("id2"))))
      else materialize(afterDel)
    }
    GraphFoldResult(prTraj2, pprTraj2, labels2, st, touched)
  }

  /** Shared engine of the PPR folds — [[pageRankSignedCore]] with the
    * seed-teleport recurrence. Contract checks (all VERIFIED, all
    * loud, fused to a minimal driver-action inventory): the it0 probe
    * recomputes the expected teleport value per node from `seeds` and
    * counts mismatches IN THE SAME aggregate that derives |V| and
    * |S∩V|; [[prepSigned]] then runs the fused added-nodes /
    * state-extra probe; the fold branch re-verifies trajectory
    * coverage of the ball's in-neighbors ([[ballCoverageCheck]]). */
  private def pprSignedCore(prevTraj: DataFrame, prevEdgesDeg: DataFrame,
                            addedPairs: DataFrame, deletedPairs: DataFrame,
                            seeds: DataFrame, iterations: Int,
                            dampNum: Long, dampDen: Long, scale: Long,
                            maybeDeletes: Boolean,
                            wantTrajectory: Boolean)
      : (DataFrame, Option[DataFrame]) = {
    require(iterations >= 1, "pprDelta: need >= 1 iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "pprDelta: need 0 < damp < 1")
    val traj0 = prevTraj.select("node", "iter", "pr")
    val it0 = traj0.filter(col("iter") === 0)
    // ONE action: |V|, |S∩V|, the per-row teleport mismatch count
    // (iterate 0 IS tele, so a caller passing a different seed set —
    // the silent-wrong-answer hazard of stateful folds — is caught by
    // construction), AND the stored depth (ADVICE r16: max(iter) must
    // equal `iterations`, or the merges silently read missing /
    // non-final iterates). The crossJoin side is a broadcast 1-row
    // aggregate over iterate 0; the outer aggregate reads the whole
    // trajectory once (which the iterate-0 filter scan did anyway).
    val seedCol = seeds.columns.head
    val trajS = traj0.join(
      broadcast(seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("is_seed", lit(1L))), Seq("node"), "left")
    val sAgg = broadcast(trajS.filter(col("iter") === 0).agg(
      sum(coalesce(col("is_seed"), lit(0L))).as("n_seeds"),
      count(lit(1)).as("n")))
    val chk = trajS.crossJoin(sAgg)
      .select(col("n_seeds"), col("n"), col("iter"),
        when(col("iter") === 0 &&
            col("pr") =!= when(col("is_seed").isNotNull,
              expr(s"$scale div n_seeds")).otherwise(lit(0L)), 1L)
          .otherwise(0L).as("bad"))
      .agg(max(col("n_seeds")).as("n_seeds"), max(col("n")).as("n"),
        sum(col("bad")).as("bad"), max(col("iter")).as("depth")).head()
    if (chk.isNullAt(1) || chk.getLong(1) == 0L)
      throw new IllegalArgumentException(
        "pprDelta: prevTraj has no iterate-0 rows — not a pprTrajectory")
    val (nSeeds, nNodes, badSeeds) =
      (chk.getLong(0), chk.getLong(1), chk.getLong(2))
    if (nSeeds == 0L)
      throw new IllegalArgumentException(
        "pprDelta: no seed appears in the graph — teleport mass " +
          "would be undefined")
    if (badSeeds > 0L)
      throw new IllegalArgumentException(
        s"pprDelta: teleport vector from `seeds` differs from the " +
          s"trajectory's iterate 0 on $badSeeds node(s) — the state " +
          "was built with a different seed set; rerun pprTrajectory")
    if (chk.getInt(3) != iterations)
      throw new IllegalArgumentException(
        s"pprDelta: the stored trajectory holds ${chk.getInt(3)} " +
          s"iterations but the fold was asked for $iterations — pass " +
          "the depth the trajectory was built with")
    val p = prepSigned(it0, prevEdgesDeg, addedPairs, deletedPairs,
      maybeDeletes, "pprDelta")
    // iterate 0, now VERIFIED, is the teleport relation (lazy: the
    // ball probe / first loop action materializes it in-job)
    val tele = lazyMat(it0.select(col("node"), col("pr").as("tele")))
    val edgesAll = prevEdgesDeg.select("src", "dst")
      .unionByName(p.dNew.select("src", "dst"))
    val hop0 = lazyMat(
      p.endsChanged.select(col("node").as("doc_id"), lit(0).as("hops")))
    val (ball0, majority) =
      bfsRoundsAggCapped(edgesAll, hop0, iterations, (nNodes + 1L) / 2L)
    logBranch("pprDelta", majority)
    if (majority) {
      val st = survivorEdgeState(prevEdgesDeg, p)
      if (wantTrajectory)
        return (pprTrajLoopN(st, tele, iterations, dampNum, dampDen),
          Some(st))
      val ranks = pprLoopFromEdges(teleFusedEdges(st, tele), tele,
        iterations, dampNum, dampDen, checkpointEvery = 5)
      // node-universe merge: stranded nodes decay to their
      // teleport-only rank (zero off the seed set)
      return (lazyMat(tele.join(ranks, Seq("node"), "left")
        .select(col("node"), coalesce(col("pr"),
          expr(s"((${dampDen - dampNum}) * tele) div $dampDen"))
          .as("pr"))), Some(st))
    }
    // ball0 is already a counted lazy checkpoint from the probe
    val ball = ball0
    // full-trajectory checkpoint only when the merged trajectory is
    // the output (pprStateFold) — tip-only folds re-scan the caller's
    // pinned state twice instead of paying the (iterations+1)·|V|
    // write floor (VERDICT r16 item 2; see pageRankSignedCore)
    val traj = if (wantTrajectory) lazyMat(traj0) else traj0
    val ballMax = ball.select(col("doc_id").as("node"))
    // plain (not tele-fused) ball edges: the ball rounds read tele
    // per BALL NODE from the verified |V|-row relation instead — a
    // ball-sized semi-join per round, which also hands stranded ball
    // nodes their teleport term (the fused layout only ever surfaced
    // tele on nodes with surviving in-edges)
    val edgesBall = ballEdges(prevEdgesDeg, p, ballMax)
    val srcBall = edgesBall.select(col("src").as("node")).distinct()
    val trajBall = lazyMat(traj.join(srcBall, Seq("node"), "left_semi"))
    ballCoverageCheck(srcBall, trajBall, "pprDelta")
    val rounds = ballRounds(traj, trajBall, ball, edgesBall,
      iterations, dampNum, dampDen,
      (ballI, inSums) => tele.join(ballI, Seq("node"), "left_semi")
        .join(inSums, Seq("node"), "left")
        .select(col("node"),
          (expr(s"((${dampDen - dampNum}) * tele) div $dampDen") +
            expr(s"($dampNum * coalesce(in_sum, " +
              s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
    if (wantTrajectory) {
      // ball-sized overrides merged over the old iterates — the same
      // merge as pageRankSignedCore's fold-branch trajectory
      val merged = lazyMat((0 to iterations).map { i =>
        val base = traj.filter(col("iter") === i)
        if (i == 0) base // iterate 0 IS tele — delta-invariant
        else base.as("o")
          .join(rounds(i - 1).as("n"), Seq("node"), "left")
          .select(col("node"), col("iter"),
            coalesce(col("n.pr"), col("o.pr")).as("pr"))
      }.reduce(_ unionByName _))
      (merged, Some(survivorEdgeState(prevEdgesDeg, p)))
    } else
      (lazyMat(
        traj.filter(col("iter") === iterations).as("o")
          .join(rounds.last.as("n"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("n.pr"), col("o.pr")).as("pr"))), None)
  }

  /** PPR trajectory loop over the node UNIVERSE — the tele relation's
    * node set, which the fold just VERIFIED is the trajectory's.
    * [[pprStateFold]]'s majority branch: every iterate keeps one row
    * per universe node (a node with no surviving in-edges decays to
    * its damped teleport term — zero off the seed set), so the
    * produced state obeys the invariants the fold verifies on input.
    * The teleport term joins from the |V|-row tele relation per
    * round instead of riding the fused edge layout, which only ever
    * surfaces tele on nodes with surviving in-edges. */
  private def pprTrajLoopN(edgesDeg: DataFrame, tele: DataFrame,
                           iterations: Int, dampNum: Long,
                           dampDen: Long): DataFrame = {
    // lazy per-iterate checkpoints (round 17) — see
    // pageRankTrajectoryFromEdges
    var pr = lazyMat(tele.select(col("node"), col("tele").as("pr")))
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      val inSums = edgesDeg.as("e")
        .join(pr.hint("shuffle_hash").as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .select(col("dst").as("node"), col("in_sum"))
      pr = lazyMat(tele.join(inSums, Seq("node"), "left")
        .select(col("node"),
          (expr(s"((${dampDen - dampNum}) * tele) div $dampDen") +
            expr(s"($dampNum * coalesce(in_sum, " +
              s"CAST(0 AS BIGINT))) div $dampDen")).as("pr")))
      iterates :+= pr.withColumn("iter", lit(i))
    }
    iterates.reduce(_ unionByName _).select("node", "iter", "pr")
  }

  /** Delta-size envelope for the folds' broadcast-hinted setup joins
    * (ADVICE r14): the symmetrized delta, its state remnants, and the
    * touched-degree patch are all delta-endpoint-sized and ride
    * explicit broadcasts — right for the daily-batch deployment
    * shape, but a pathological delta (half the graph re-sent) would
    * OOM the driver before the locality pricing ever ran. Past this
    * many symmetrized delta rows the folds keep the SAME joins
    * without the hints (Spark shuffles them — slower, never fatal).
    * Env-overridable for clusters with bigger drivers. */
  private val MaxBroadcastDeltaRows: Long =
    sys.env.get("GRAFT_MAX_BROADCAST_DELTA_ROWS").map(_.toLong)
      .getOrElse(4000000L)

  private def hintIf(small: Boolean)(df: DataFrame): DataFrame =
    if (small) broadcast(df) else df

  /** One stderr line per fold naming the priced branch decision —
    * VERDICT r15 item 8 asks the decision be VISIBLE, so a fixture
    * (e.g. the hash-sliced `graph_pagerank_delta_rand`) documents
    * which branch its delta shape exercised. The last decision is
    * also recorded for SPECS (VERDICT r16 item 6: a pricing
    * regression must fail a test, not just change a log line) —
    * `lastBranch` holds (fold name, tookMajorityBranch). */
  @volatile private[graft] var lastBranch: Option[(String, Boolean)] = None
  private def logBranch(who: String, majority: Boolean): Unit = {
    lastBranch = Some((who, majority))
    System.err.println(s"[graphops] $who: locality probe -> " +
      (if (majority) "MAJORITY ball (incremental-recompute branch)"
       else "minority ball (restricted-fold branch)"))
  }

  /** Shared setup of the signed ranking folds: the delta reduced to
    * its GENUINELY new / genuinely gone directed rows, the
    * touched-degree patch, the changed-endpoint ball seeds, and the
    * fused contract probe. All relations delta-endpoint-sized and
    * materialized; `small` says they fit [[MaxBroadcastDeltaRows]]. */
  private case class SignedPrep(dNew: DataFrame, dGone: DataFrame,
                                touchedDeg: DataFrame,
                                endsChanged: DataFrame,
                                hasDeletes: Boolean, small: Boolean,
                                nAddRaw: Long, nDelRaw: Long)

  private def symPairs(pairs: DataFrame): DataFrame =
    pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()

  /** Delta prep + the fused structural probe (ONE driver action, a
    * union-tagged count over small relations): delta endpoints
    * must all carry trajectory rows (a new node moves every teleport
    * term — rerun from scratch or segment), and the STATE must not
    * carry nodes the trajectory lacks (a mismatched (traj, state)
    * pair — ADVICE r14's silent-wrong-answer hazard; the state's
    * distinct-src reuses its src hash partitioning, so the probe is
    * one scan, no exchange. The state MAY carry fewer nodes: a
    * deletion strands nodes out of the edge relation while the
    * trajectory keeps them — that direction is verified ball-locally
    * by [[ballCoverageCheck]]). The broadcast-envelope sizes (|add| +
    * |del| symmetrized rows vs [[MaxBroadcastDeltaRows]]) ride the
    * SAME aggregate (VERDICT r15 item 5 — they were two separate
    * count() actions; the fold's pitch is per-batch latency and
    * actions are its floor), so the whole prep pays ONE driver
    * round-trip. Deletion rows naming edges absent from the state
    * are tolerated (they vanish in the semi-join), matching
    * [[componentsDelete]]. */
  private def prepSigned(it0: DataFrame, prevEdgesDeg: DataFrame,
                         addedPairs: DataFrame, deletedPairs: DataFrame,
                         maybeDeletes: Boolean,
                         who: String): SignedPrep = {
    // round 17: ONE lazily-materialized checkpoint for both signed
    // sides (sign-tagged union of the two per-side distincts) instead
    // of one eager checkpoint each — the fused probe's collect below
    // is the action that materializes the blocks, so the prep pays no
    // standalone checkpoint jobs at all. Values unchanged: the tag
    // keeps the sides disjoint, and each side was distinct'd before
    // the union exactly as before.
    val bothSym =
      if (maybeDeletes) lazyMat(
        symPairs(addedPairs).withColumn("sgn", lit(1))
          .unionByName(symPairs(deletedPairs).withColumn("sgn", lit(-1))))
      else lazyMat(symPairs(addedPairs).withColumn("sgn", lit(1)))
    val dSym = bothSym.filter(col("sgn") === 1).drop("sgn")
    val delSym =
      if (maybeDeletes) bothSym.filter(col("sgn") === -1).drop("sgn")
      else dSym.limit(0)
    val it0N = it0.select(col("node"))
    // node check on ADDITION endpoints only: deletion endpoints are
    // either prior-state nodes (⊆ trajectory by the state_extra
    // probe) or phantom rows the semi-join already dropped
    val ends = dSym.select(col("src").as("node")).distinct()
    val probe = ends.join(it0N, Seq("node"), "left_anti")
        .select(lit("added_nodes").as("k"))
      .unionByName(prevEdgesDeg.select(col("src").as("node")).distinct()
        .join(it0N, Seq("node"), "left_anti")
        .select(lit("state_extra").as("k")))
      .unionByName(dSym.select(lit("n_add").as("k")))
      .unionByName(delSym.select(lit("n_del").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val small = probe.getOrElse("n_add", 0L) +
      probe.getOrElse("n_del", 0L) <= MaxBroadcastDeltaRows
    // two-step anti-join: a direct `dSym ANTI prevEdgesDeg` cannot
    // broadcast (only the RIGHT side of a left-anti broadcasts, and
    // the state is |E|-sized), so Spark would sort-merge-shuffle the
    // whole state — measured as the fold's dominant cost. Restrict
    // the state to the delta's keys first (semi, scan-only) and anti
    // against that delta-sized remnant.
    val existing = prevEdgesDeg.select("src", "dst")
      .join(hintIf(small)(dSym), Seq("src", "dst"), "left_semi")
    // genuinely gone = (deleted ∩ prior) − added: an edge deleted and
    // re-added in the same batch nets to "present, degree unchanged"
    // under the survivor law (prior − deleted) ∪ added.
    // round 17: new and gone share ONE lazy sign-tagged checkpoint
    // (they were two eager ones); the ball probe's first count below
    // (via endsChanged/hop0) materializes the blocks in-job.
    val newPlan = dSym
      .join(hintIf(small)(existing), Seq("src", "dst"), "left_anti")
    val bothNg =
      if (maybeDeletes) lazyMat(
        newPlan.withColumn("sgn", lit(1)).unionByName(
          prevEdgesDeg.select("src", "dst")
            .join(hintIf(small)(delSym), Seq("src", "dst"), "left_semi")
            .join(hintIf(small)(dSym), Seq("src", "dst"), "left_anti")
            .withColumn("sgn", lit(-1))))
      else lazyMat(newPlan.withColumn("sgn", lit(1)))
    val dNew = bothNg.filter(col("sgn") === 1).drop("sgn")
    val dGone =
      if (maybeDeletes) bothNg.filter(col("sgn") === -1).drop("sgn")
      else delSym
    val addedN = probe.getOrElse("added_nodes", 0L)
    if (addedN > 0L)
      throw new IllegalArgumentException(
        s"$who: delta adds $addedN new node(s) — the trajectory " +
          "carries no iterates for them and n_nodes would move every " +
          "teleport term; rerun the trajectory from scratch or " +
          "segment the graph")
    val extraN = probe.getOrElse("state_extra", 0L)
    if (extraN > 0L)
      throw new IllegalArgumentException(
        s"$who: the edge state carries $extraN node(s) the " +
          "trajectory lacks — a mismatched (trajectory, state) pair; " +
          "rebuild the pair from the same graph")
    // touched-sized degree maintenance: new degree = old + additions
    // − deletions, for changed endpoints only; the old-degree read is
    // one filtered SCAN of the state
    val degInc = dNew.groupBy(col("src")).agg(count(lit(1)).as("inc"))
    val degDec = dGone.groupBy(col("src")).agg(count(lit(1)).as("dec"))
    val touched = degInc.join(degDec, Seq("src"), "full_outer")
      .select(col("src"), coalesce(col("inc"), lit(0L)).as("inc"),
        coalesce(col("dec"), lit(0L)).as("dec"))
    val touchedDeg = lazyMat(
      touched.join(
          prevEdgesDeg
            .join(hintIf(small)(touched.select(col("src"))), Seq("src"),
              "left_semi")
            .groupBy(col("src")).agg(max(col("deg")).as("deg_old")),
          Seq("src"), "left")
        .select(col("src"),
          (coalesce(col("deg_old"), lit(0L)) + col("inc") - col("dec"))
            .as("deg")))
    // ball seeds: endpoints of GENUINE changes only (absorbed
    // duplicate additions and phantom deletions perturb nothing)
    val endsChanged = dNew.select(col("src").as("node"))
      .unionByName(dGone.select(col("src").as("node"))).distinct()
    SignedPrep(dNew, dGone, touchedDeg, endsChanged, maybeDeletes, small,
      probe.getOrElse("n_add", 0L), probe.getOrElse("n_del", 0L))
  }

  /** One scan of `edges` with the changed endpoints' degrees patched
    * from the touched relation (broadcast inside the envelope). */
  private def patchDegrees(edges: DataFrame, p: SignedPrep): DataFrame =
    edges.as("e")
      .join(hintIf(p.small)(
          p.touchedDeg.select(col("src"), col("deg").as("deg_new"))),
        Seq("src"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("deg_new"), col("deg")).as("deg"))

  /** The UPDATED [[pageRankEdgeState]] after a signed delta — one
    * scan of the prior state (gone rows anti-joined away, touched
    * degrees patched) plus the genuinely-new rows, repartitioned on
    * the per-round join key and materialized. Nodes whose last edge
    * was deleted simply have no rows; the TRAJECTORY still carries
    * them (the node universe is the trajectory's — see
    * [[pageRankDelete]]). */
  private def survivorEdgeState(prevEdgesDeg: DataFrame,
                                p: SignedPrep,
                                pin: Boolean = true): DataFrame = {
    val kept =
      if (p.hasDeletes)
        prevEdgesDeg.select("src", "dst", "deg")
          .join(hintIf(p.small)(p.dGone), Seq("src", "dst"), "left_anti")
      else prevEdgesDeg.select("src", "dst", "deg")
    val out = patchDegrees(kept, p)
      .unionByName(p.dNew.join(hintIf(p.small)(p.touchedDeg), Seq("src"))
        .select(col("src"), col("dst"), col("deg")))
      .repartition(col("src"))
    // pin = false when the state is only PERSISTED downstream (the
    // pack fold's restricted branch: the publisher's parquet write is
    // the one consumer) — a checkpoint there would write the full |E|
    // relation once extra for nothing (VERDICT r16 item 2's floor).
    // pin = true is a LAZY checkpoint since round 17: the consuming
    // loop's first action materializes it, same blocks, one less job
    if (pin) lazyMat(out) else out
  }

  /** The fold's edge relation: ball-restricted survivors,
    * degree-patched, partitioned on the per-round join key — built
    * from one scan of the state plus the (ball-restricted) new
    * rows. */
  private def ballEdges(prevEdgesDeg: DataFrame, p: SignedPrep,
                        ballMax: DataFrame): DataFrame = {
    val priorBall = prevEdgesDeg.as("pe")
      .join(ballMax, col("pe.dst") === ballMax("node"), "left_semi")
    val kept =
      if (p.hasDeletes)
        priorBall.join(hintIf(p.small)(p.dGone), Seq("src", "dst"),
          "left_anti")
      else priorBall
    lazyMat(
      patchDegrees(kept.select("src", "dst", "deg"), p)
        .unionByName(
          p.dNew.as("d")
            .join(ballMax, col("d.dst") === ballMax("node"), "left_semi")
            .join(hintIf(p.small)(p.touchedDeg), Seq("src"))
            .select(col("src"), col("dst"), col("deg")))
        .repartition(col("src")))
  }

  /** Verify the restricted trajectory covers every in-neighbor the
    * ball rounds will read — the DIRECT, ball-sized guard against a
    * mismatched (trajectory, state) pair silently dropping
    * in-neighbor contributions (ADVICE r14). One fused action (the
    * two counts union-tag into one aggregate); refuses loudly. */
  private def ballCoverageCheck(srcBall: DataFrame, trajBall: DataFrame,
                                who: String): Unit = {
    val cov = srcBall.select(lit("src").as("k"))
      .unionByName(trajBall.filter(col("iter") === 0)
        .select(lit("cov").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (s, c) = (cov.getOrElse("src", 0L), cov.getOrElse("cov", 0L))
    if (s != c)
      throw new IllegalArgumentException(
        s"$who: ${s - c} in-neighbor node(s) of the delta ball have " +
          "no trajectory rows — a mismatched (trajectory, state) " +
          "pair would silently drop their contributions; rebuild the " +
          "pair from the same graph")
  }

  /** The ball-restricted rounds shared by both recurrences: for
    * i = 1..iterations, join the ball-i-restricted survivor edges
    * against iterate i−1 (old trajectory at the rim, the growing
    * newVals inside), aggregate in-mass per dst, then hand
    * (ballI, inSums) to the recurrence-specific assembler (the
    * teleport term is where the recurrences differ). The assembler
    * receives inSums that OMIT ball nodes with no surviving in-edges
    * — deletions strand such nodes — so it must left-join and
    * coalesce the in-mass to zero (every node of ballI gets a row:
    * that is what makes the override relation cover the ball
    * exactly). Returns the per-iterate overrides (index i−1 =
    * iterate i), each materialized. */
  private def ballRounds(traj: DataFrame, trajBall: DataFrame,
                         ball: DataFrame, edgesBall: DataFrame,
                         iterations: Int, dampNum: Long, dampDen: Long,
                         assemble: (DataFrame, DataFrame) => DataFrame)
      : Vector[DataFrame] = {
    var newVals = traj.filter(col("iter") === 0)
      .join(ball.filter(col("hops") <= 0).select(col("doc_id").as("node")),
        Seq("node"), "left_semi")
      .select(col("node"), col("pr"))
    var out = Vector.empty[DataFrame]
    for (i <- 1 to iterations) {
      val ballI = ball.filter(col("hops") <= i)
        .select(col("doc_id").as("node"))
      // iterate i−1 over edgesBall's source set = old trajectory
      // overridden inside ball i−1 (newVals covers exactly that
      // ball; newVals rows outside the source set feed no round-i
      // edge and are re-merged from the FINAL overrides at the end)
      val prPrev = trajBall.filter(col("iter") === i - 1).as("o")
        .join(newVals.as("n"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("n.pr"), col("o.pr")).as("pr"))
      val inSums = edgesBall.as("e")
        .join(ballI.as("b"), col("e.dst") === col("b.node"), "left_semi")
        .join(prPrev.as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .select(col("dst").as("node"), col("in_sum"))
      // lazy: no action runs between rounds, so the whole round chain
      // materializes inside the caller's merge action (round 17)
      newVals = lazyMat(assemble(ballI, inSums))
      out :+= newVals
    }
    out
  }

  /** Incremental [[connectedComponents]]: fold a NEW edge delta into
    * an existing labeling without re-clustering the old graph.
    * `prevLabels` is a (doc_id, cluster_id) relation from a prior
    * components run; `newPairs` (id1, id2) is the delta — edges among
    * new documents and/or between new and old. Returns the labeling
    * of the UNION graph, identical to re-running components from
    * scratch (the equivalence the spec proves on random splits).
    *
    * Why it's exact: a prior component re-enters as its label STAR
    * (every member paired with the root), which preserves its
    * connectivity exactly, and the union's component minima are the
    * true minima because star edges keep original node ids. Prior
    * singletons ride along as self-pairs — the edge canonicalization
    * drops the loop but the node set keeps the id, so an untouched
    * singleton stays labeled by itself.
    *
    * The 100 TB point: a daily corpus delta re-clusters |V_old| + |Δ|
    * rows, never the old |E| — the mined pair set (tens of edges per
    * boilerplate-heavy doc) collapses to one row per document, and
    * the star input is already at the contraction fixpoint for every
    * untouched component, so rounds are spent only where the delta
    * actually rewires. */
  def componentsDelta(prevLabels: DataFrame, newPairs: DataFrame,
                      maxIters: Int = 50): DataFrame =
    connectedComponents(
      prevLabels.select(col("doc_id").as("id1"), col("cluster_id").as("id2"))
        .unionByName(newPairs.select(col("id1"), col("id2"))),
      maxIters)

  /** EDGE DELETIONS for the components IVM — the maintenance law
    * [[componentsDelta]] declares out of scope, closed by SCOPED
    * RE-EVALUATION (the standard treatment for decremental
    * connectivity in batch-ish systems: deletions can SPLIT a
    * component, which no label fold can repair, so re-cluster — but
    * only where a deletion actually landed). Returns the labeling of
    * `prevPairs − deletedPairs` over the PRIOR node set (an edge
    * deletion never deletes a document: a node stranded by the
    * deletion survives as its own singleton cluster), row-for-row
    * equal to `connectedComponents` from scratch on the surviving
    * edges (the `graph_components_delete` oracle's closure).
    *
    * Why scoped is exact: components partition the node set, so an
    * edge deletion inside component C changes NOTHING outside C —
    * untouched components keep their exact member sets and therefore
    * their exact min-id labels; re-clustering the TOUCHED components
    * from scratch on their induced surviving edges reproduces the
    * from-scratch result on those nodes by definition.
    *
    * Cost model (the 100 TB point): one canonicalize + anti-join
    * pass over the prior edge set (the deleted set broadcasts — a
    * daily deletion batch is small), one labels pass to split
    * touched from untouched, then star contraction over ONLY the
    * touched components' edges. Locality economics as in
    * [[pageRankDelta]]: deletions concentrated in a few components
    * re-cluster a sliver; deletions sprayed across every component
    * degrade to a full re-cluster (and the untouched pass-through
    * costs one anti-join on top — same honest degradation). Deleted
    * edges that never existed are tolerated: the anti-join ignores
    * them, at worst their endpoints' components re-cluster to the
    * labels they already had. */
  def componentsDelete(prevLabels: DataFrame, prevPairs: DataFrame,
                       deletedPairs: DataFrame,
                       maxIters: Int = 50): DataFrame = {
    val e = materialize(canonicalEdges(prevPairs))
    val d = materialize(canonicalEdges(deletedPairs))
    // the broadcast-envelope gate the ranking folds carry (ADVICE
    // r15): size the canonical deleted set BEFORE pinning its
    // broadcast, so a pathological batch (half the graph retracted)
    // degrades to a shuffled anti-join instead of a driver OOM
    val small = d.count() <= MaxBroadcastDeltaRows
    val survivors = survivingEdges(e, d, small)
    // clusters holding any deleted-edge endpoint re-cluster; all
    // others pass through verbatim (their member sets are untouched)
    val labels = materialize(prevLabels.select("doc_id", "cluster_id"))
    val delNodes = d.select(col("a").as("doc_id"))
      .unionByName(d.select(col("b").as("doc_id"))).distinct()
    val touched = labels.join(delNodes, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val untouched = labels.join(touched, Seq("cluster_id"), "left_anti")
    val touchedNodes = labels.join(touched, Seq("cluster_id"), "left_semi")
      .select(col("doc_id"))
    // both endpoints of a surviving edge share a prior component, so
    // one-sided membership decides the whole edge; self-pairs keep
    // stranded nodes labeled (the componentsDelta singleton trick)
    val subEdges = survivors
      .join(touchedNodes.withColumnRenamed("doc_id", "a"), Seq("a"),
        "left_semi")
      .select(col("a").as("id1"), col("b").as("id2"))
      .unionByName(touchedNodes
        .select(col("doc_id").as("id1"), col("doc_id").as("id2")))
    connectedComponents(subEdges, maxIters)
      .unionByName(untouched.select("doc_id", "cluster_id"))
  }

  /** Multi-source BFS over an UNDIRECTED edge list `pairs` (columns
    * id1, id2): minimum hop distance from any node of `seeds` (a
    * 1-column relation of node ids) to every reachable node, capped
    * at `maxHops`. Returns (doc_id, hops) for nodes at distance
    * ≤ maxHops ONLY — seeds outside the pair graph and nodes beyond
    * the cap are absent, so the cap is part of the output contract
    * (the oracle bounds its path recursion identically).
    *
    * This is the curation primitive the component/cluster labels
    * don't give: PROXIMITY to a trusted set — "how many similarity
    * hops from a known-good (or known-bad) document" grades
    * contamination spread and seed-set expansion, where
    * [[connectedComponents]] only answers reachable-or-not.
    *
    * Scale posture (100 TB): textbook frontier BSP, one Spark job per
    * round. The edge list checkpoints once, hash-partitioned on src
    * (symmetrized by a single explode pass — the pair source is
    * scanned once — and deduplicated by a post-repartition aggregate
    * that reuses that partitioning, so setup is ONE exchange). Each
    * round joins the frontier (a narrow filter on the distance
    * relation, whose groupBy partitioning aligns with the edges' —
    * no exchange on either join side) and folds the candidates in
    * with ONE min-aggregate shuffle: rows whose min stays at an older
    * hop are exactly the already-visited ones, so the aggregate IS
    * the dedup + anti-join. The round's `count()` doubles as the
    * materialization action (lazy localCheckpoint — lineage depth one
    * per round) AND the convergence probe: the relation only ever
    * grows, so a stable count means an empty frontier and the loop
    * exits without a separate isEmpty job.
    *
    * `aggShape = false` keeps the first-cut distinct + anti-join
    * round for [[graft.AbBfs]]'s interleaved comparison: two extra
    * shuffles and a second job per round, plus an anti-join side that
    * re-scans every prior frontier checkpoint. At sf0.1 the shapes
    * TIE within session noise (both ~3.1-3.5 s; per-round cost is
    * 0.06-0.11 s against ~1.5 s of pair-gen + setup, profiled per
    * round) — the agg fold is kept because its per-round cost is one
    * shuffle of the |V|-row distance relation with O(1) checkpoint
    * scans, where the anti-join shape scans all k prior frontier
    * checkpoints in round k, the term that grows with graph diameter
    * at 100 TB. */
  def bfsHops(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 10,
              aggShape: Boolean = true): DataFrame = {
    require(maxHops >= 0, "bfsHops: maxHops must be >= 0")
    val sym = symmetrize(pairs)
    if (aggShape) {
      // lazy checkpoints: hop0's count() below materializes the whole
      // setup chain — edges included — in a single job
      val edges = sym.repartition(col("src")).dropDuplicates("src", "dst")
        .localCheckpoint(eager = false)
      val hop0 = bfsSeedFrontier(edges, seeds).localCheckpoint(eager = false)
      bfsRoundsAgg(edges, hop0, maxHops)
    } else {
      val edges = sym.distinct().repartition(col("src"))
        .localCheckpoint(eager = true)
      val hop0 = materialize(bfsSeedFrontier(edges, seeds))
      bfsRoundsAntiJoin(edges, hop0, maxHops)
    }
  }

  /** Both directions of an (id1, id2) pair list as (src, dst) rows,
    * self-loops dropped — ONE pass over the source (explode, not a
    * self-union, so an expensive upstream miner is scanned once). */
  private def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(
        struct(col("id1").as("src"), col("id2").as("dst")),
        struct(col("id2").as("src"), col("id1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))

  /** Hop 0 = seed nodes that exist in the graph; left_semi keeps the
    * node set's own (deduplicated) rows whatever the seed relation
    * holds. Every node of the symmetrized edge list appears as a src,
    * so src alone covers the vertex set. */
  private def bfsSeedFrontier(edges: DataFrame, seeds: DataFrame): DataFrame = {
    val seedCol = seeds.columns.head
    edges.select(col("src").as("doc_id")).distinct()
      .join(seeds.select(col(seedCol).as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), lit(0).as("hops"))
  }

  /** One job and one shuffle per round:
    * dist ∪ (edges ⋈ frontier) → min(hops), count as the probe. */
  private def bfsRoundsAgg(edges: DataFrame, hop0: DataFrame,
                           maxHops: Int): DataFrame =
    bfsRoundsAggCapped(edges, hop0, maxHops, Long.MaxValue)._1

  /** [[bfsRoundsAgg]] with a SIZE bail-out for the delta folds'
    * locality pricing: the ball only grows, so the moment `dist`
    * reaches `stopAtSize` the majority verdict is already decided —
    * stop, return (partial dist, true), and let the caller take the
    * recompute branch without paying the remaining |V|-sized rounds
    * (on a scattered delta those are most of the probe's cost). The
    * convergence probe's count doubles as the size check, so the
    * cap costs nothing. */
  private def bfsRoundsAggCapped(edges: DataFrame, hop0: DataFrame,
                                 maxHops: Int,
                                 stopAtSize: Long): (DataFrame, Boolean) = {
    var dist = hop0
    var size = dist.count()
    if (size >= stopAtSize) return (dist, true)
    var hop = 0
    var done = size == 0L
    while (!done && hop < maxHops) {
      hop += 1
      val frontier = dist.filter(col("hops") === hop - 1)
      val cand = edges.join(frontier.select(col("doc_id").as("src")), Seq("src"))
        .select(col("dst").as("doc_id"), lit(hop).as("hops"))
      dist = dist.unionByName(cand).groupBy("doc_id")
        .agg(min(col("hops")).as("hops"))
        .localCheckpoint(eager = false)
      val n = dist.count()
      if (n >= stopAtSize) return (dist, true)
      done = n == size
      size = n
    }
    (dist, false)
  }

  /** First-cut round shape: distinct + anti-join vs all prior
    * frontiers (three shuffles; measurement baseline only). */
  private def bfsRoundsAntiJoin(edges: DataFrame, hop0: DataFrame,
                                maxHops: Int): DataFrame = {
    var frontier = hop0
    var visited = Vector(frontier)
    var hop = 0
    var done = frontier.isEmpty
    while (!done && hop < maxHops) {
      hop += 1
      val dist = visited.reduce(_ unionByName _).select(col("doc_id"))
      val next = materialize(
        edges.join(frontier.select(col("doc_id").as("src")), Seq("src"))
          .select(col("dst").as("doc_id")).distinct()
          .join(dist, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit(hop).as("hops")))
      if (next.isEmpty) done = true
      else { visited = visited :+ next; frontier = next }
    }
    visited.reduce(_ unionByName _)
  }

  /** k-core of an UNDIRECTED edge list `pairs` (columns id1, id2):
    * the maximal subgraph in which every node has degree ≥ k,
    * computed by the standard peel — repeatedly drop every node whose
    * CURRENT degree is below k until a fixpoint (or `maxRounds`
    * peels; a converged graph is a no-op under further peels, so the
    * bound only matters for adversarially deep peel chains and the
    * oracle applies the identical bound). Returns the surviving node
    * ids as (doc_id).
    *
    * The curation read: in a near-duplicate similarity graph, plain
    * components find reachable groups but a k-core finds the DENSE
    * groups — template farms, boilerplate rings, mirror clusters —
    * where every member is similar to k+ others. Pairs and stars
    * (one hub, many leaves) peel away; mutually-similar cliques
    * survive. That makes core membership a per-document removal
    * signal components can't give (a star's leaves share a component
    * with the hub but are NOT in its 2-core).
    *
    * Scale posture (100 TB): one job and at most one |E|-row shuffle
    * per peel round. Degrees reuse the edge relation's src hash
    * partitioning (no exchange); dropped nodes come back as an
    * anti-join on both endpoints, and because the dropped set shrinks
    * to near-nothing after the first rounds AQE turns those
    * anti-joins into broadcasts — late rounds shuffle nothing. The
    * round's `count()` doubles as the lazy-checkpoint materialization
    * and the convergence probe: peeling only removes edges, so a
    * stable edge count ⟺ no node dropped ⟺ fixpoint. */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    require(maxRounds >= 0, "kCore: maxRounds must be >= 0")
    var edges = symmetrize(pairs)
      .repartition(col("src")).dropDuplicates("src", "dst")
      .localCheckpoint(eager = false)
    var size = edges.count()
    var round = 0
    var done = size == 0L
    while (!done && round < maxRounds) {
      round += 1
      val dropped = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("src"))
      edges = edges.join(dropped, Seq("src"), "left_anti")
        .join(dropped.select(col("src").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = false)
      val n = edges.count()
      done = n == size
      size = n
    }
    edges.select(col("src").as("doc_id")).distinct()
  }

  /** Structural convergence test for [[connectedComponents]]: a
    * canonical (a < b, distinct) edge set is a min-rooted star forest
    * iff NO node appears as both a source and a target (depth ≤ 1)
    * and every target has exactly ONE source (parent function). Then
    * each component IS one star and canonicality makes its root the
    * component minimum — the labels are final. Checking the NEW edge
    * set structurally, instead of comparing it to the previous round
    * (count + exceptAll), both halves the per-round bookkeeping jobs
    * and exits a full alternation EARLIER: the compare-based test
    * must run one more round just to observe "no change". */
  private def isMinRootedStarForest(e: DataFrame): Boolean =
    e.select(col("a").as("n"), lit(1L).as("s"), lit(0L).as("t"))
      .unionByName(e.select(col("b").as("n"), lit(0L).as("s"), lit(1L).as("t")))
      .groupBy(col("n"))
      .agg(sum(col("s")).as("s"), sum(col("t")).as("t"))
      .filter((col("s") > 0 && col("t") > 0) || col("t") > 1)
      .isEmpty

  /** Prior canonical edges minus the deleted set. The deleted side is
    * PINNED broadcast (VERDICT r14 item 5): the doc's cost model says
    * "a daily deletion batch is small", and on a mis-estimate Spark
    * would otherwise sort-merge the full |E| prior relation against
    * it — exactly the scale-killer the model promises away. Plan
    * shape asserted by PlanSpec (package-private for that). `small`
    * is the caller's [[MaxBroadcastDeltaRows]] envelope verdict
    * (ADVICE r15): a pathological deletion batch past the envelope
    * keeps the SAME anti-join unhinted — Spark shuffles it, slower
    * but never a driver OOM — instead of an unconditional hint. */
  private[graft] def survivingEdges(canonPrior: DataFrame,
                                    canonDeleted: DataFrame,
                                    small: Boolean = true): DataFrame =
    canonPrior.join(hintIf(small)(canonDeleted), Seq("a", "b"), "left_anti")

  /** Canonical (a < b, distinct, loop-free) edge relation. */
  private def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-vertex degree over the canonical edge relation. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

  /** DEGREE-ORDERED oriented wedges — the Suri & Vassilvitskii
    * ("Counting triangles and the curse of the last reducer",
    * WWW 2011) remedy for the skew hot spot: orient every edge from
    * its endpoint LOWER in the total (deg, id) order to the higher
    * one, then form wedges only as pairs of OUT-edges of a shared
    * pivot. Each vertex's out-degree is bounded by O(√m) — a celebrity
    * node of degree d contributes 0 wedges as a pivot (all its edges
    * point IN) instead of Θ(d²) — so total wedge volume is O(m^{3/2})
    * regardless of skew, and a triangle's pivot is UNIQUE (its
    * (deg, id)-minimal vertex), so the closing join counts each
    * triangle exactly once with no /3 correction. Package-private so
    * the skew spec can measure the wedge volume directly.
    * Columns: (wp, wu, ww) — the pivot and its two out-neighbors,
    * wu < ww by id, the candidate closing edge already in canonical
    * form (the pivot rides along for per-node statistics). */
  private[graft] def orientedWedges(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val deg = degrees(e)
    // the degree rides onto each edge via two equi-joins keyed on the
    // edge's own endpoints — the same keys the wedge join shuffles on
    val eo = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    eo.alias("o1")
      .join(eo.alias("o2"), col("o1.src") === col("o2.src") &&
        col("o1.dst") < col("o2.dst"))
      .select(col("o1.src").as("wp"),
        col("o1.dst").as("wu"), col("o2.dst").as("ww"))
  }

  /** Triangle census of an undirected pair graph — the classic
    * cohesion statistic (and the textbook distributed-join graph
    * kernel). Triangles enumerate as degree-ordered oriented wedges
    * ([[orientedWedges]]) joined against the closing edge: each
    * triangle found EXACTLY once, wedge volume bounded O(m^{3/2})
    * under any skew — one hub of degree d costs Θ(d²) wedges under
    * naive id-ordering (round 8's shape) and 0 as a pivot here.
    *
    * `n_wedges` reports the GRAPH statistic — the number of 2-paths,
    * Σ_v C(deg(v), 2) — computed exactly from the degree relation
    * (one |V|-row aggregate, no enumeration at all), so
    * closure8 = 3·triangles / wedges is the standard global
    * clustering coefficient. The enumerated oriented-wedge volume is
    * an EXECUTION detail, deliberately smaller. Output is one row
    * (n_nodes, n_edges, n_wedges, n_triangles, closure8). */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val deg = degrees(e)
    val nodes = deg.select(col("v"))
    val wedges = orientedWedges(pairs)
    val triangles = wedges.join(e.alias("e3"),
      col("wu") === col("e3.a") && col("ww") === col("e3.b"))
    // four 1-row aggregates crossed into one row: a single plan, no
    // driver-side count choreography
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(deg.agg(
        coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L))
          .as("n_wedges"))))
      .crossJoin(broadcast(triangles.agg(count(lit(1)).as("n_triangles"))))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(
          when(col("n_wedges") === 0L, 0.0)
            .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")),
          8).as("closure8"))
  }

  /** Per-node triangle participation and LOCAL clustering coefficient
    * — [[triangleCensus]]'s global statistic broken down per vertex:
    * (doc_id, n_tri, n_wedges = C(deg, 2), lcc8 = n_tri / n_wedges).
    * In a near-dup similarity graph high lcc marks nodes whose
    * neighborhoods are mutually similar — template neighborhoods —
    * where a star hub (many neighbors, none similar to each other)
    * scores 0; the per-document score the census's single global
    * number can't give.
    *
    * Same skew posture as the census: triangles enumerate once via
    * the degree-ordered oriented wedges (O(m^{3/2}) volume under any
    * skew), each triangle explodes to its three corners, and the
    * per-node count is one aggregate; wedge counts come from the
    * degree relation — no enumeration. Integer columns are exact;
    * lcc8 follows closure8's round-to-8 contract. */
  def localClustering(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val deg = degrees(e)
    val tri = orientedWedges(pairs).join(e.alias("e3"),
      col("wu") === col("e3.a") && col("ww") === col("e3.b"))
    val perNode = tri
      .select(explode(array(col("wp"), col("wu"), col("ww"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("doc_id"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("deg * (deg - 1) div 2").as("n_wedges"),
        round(
          when(col("deg") < 2, 0.0)
            .otherwise(coalesce(col("n_tri"), lit(0L)) /
              expr("deg * (deg - 1) div 2")),
          8).as("lcc8"))
  }

  /** Per-node triangle counts off a MAINTAINED [[pageRankEdgeState]]
    * — the bootstrap of the triangles IVM pair ([[trianglesDelta]]
    * folds signed edge deltas into it). Output: (doc_id, n_tri) with
    * one row per STATE NODE (zero-triangle nodes kept — the row set
    * IS the fold's node universe), n_tri equal row for row to
    * [[localClustering]]'s per-node census on the same graph.
    * Shares [[triangleCensus]]'s skew posture: degree-ordered
    * oriented wedges, O(m^{3/2}) volume under any skew. The edge
    * state is recurrence-agnostic (the same relation feeds the
    * ranking and components folds), so one maintained state serves
    * a fourth family. */
  def triangleCountsFromEdges(edgesDeg: DataFrame): DataFrame = {
    val uni = edgesDeg.select(col("src").as("v")).distinct()
    val pairs = edgesDeg.filter(col("src") < col("dst"))
      .select(col("src").as("id1"), col("dst").as("id2"))
    val e = canonicalEdges(pairs)
    val tri = orientedWedges(pairs).join(e.alias("e3"),
      col("wu") === col("e3.a") && col("ww") === col("e3.b"))
    val perNode = tri
      .select(explode(array(col("wp"), col("wu"), col("ww"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    uni.join(perNode, Seq("v"), "left")
      .select(col("v").as("doc_id"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Incremental per-node triangle counting — the triangles family
    * joins the graph IVM set (ranking trajectories, components
    * labels) under the same signed survivor law
    * `(prior − deleted) ∪ added` and the same refuse-rather-than-
    * trust prep: additions naming nodes outside the count relation's
    * universe refuse (the node-preserving contract every fold in the
    * family carries), state/universe mismatches refuse, phantom
    * deletions and duplicate additions are absorbed exactly
    * ([[prepSigned]]'s genuine sets). `prevTri` is
    * [[triangleCountsFromEdges]]'s output (or a prior fold's);
    * `prevEdgesDeg` the matching [[pageRankEdgeState]]. Like
    * [[componentsDelta]]'s labeling, the count relation itself is
    * trusted to belong to the state — there is no cheap invariant
    * that could verify counts without recounting.
    *
    * Result: (doc_id, n_tri) over the SAME universe, equal row for
    * row to the from-scratch census on the survivor graph (stranded
    * nodes decay to 0 as their triangles retract — the
    * `graph_triangles_fold` oracle's derivation).
    *
    * Why it's exact: a triangle's membership changes iff it contains
    * a changed edge. Every triangle of the survivor graph containing
    * ≥ 1 genuinely-added edge is NEW (the added edge wasn't in the
    * prior graph), and every prior triangle containing ≥ 1
    * genuinely-gone edge is DEAD (the gone edge isn't in the
    * survivor graph); a triangle with both kinds is in neither graph
    * and in neither enumeration (the add side probes survivor
    * adjacency only, the delete side prior adjacency only). Each
    * side enumerates DISTINCT sorted node triples — a triangle
    * closed by two or three delta edges dedups to one row — then
    * explodes to its three corners: ΔT = corners(+) − corners(−).
    *
    * Scale shape: candidate volume is Σ_{(u,v)∈Δ} min(deg u, deg v)
    * — each delta edge probes its LOWER-degree endpoint's adjacency
    * (additions use the post-delta degrees the prep already
    * maintains; deletions read the touched nodes' prior degrees in
    * one filtered state scan), then one equi-join against the
    * closing edge. Delta-sized relations broadcast inside the
    * [[MaxBroadcastDeltaRows]] envelope and degrade to shuffles past
    * it — never a nested loop, never an all-pairs. */
  def trianglesDelta(prevTri: DataFrame, prevEdgesDeg: DataFrame,
                     addedPairs: DataFrame,
                     deletedPairs: DataFrame): DataFrame = {
    val uni = prevTri.select(col("doc_id"), col("n_tri"))
    val it0 = uni.select(col("doc_id").as("node"))
    val p = prepSigned(it0, prevEdgesDeg, addedPairs, deletedPairs,
      maybeDeletes = true, "trianglesDelta")
    // survivor adjacency: read by both add-side joins — pinned
    val adjS = survivorEdgeState(prevEdgesDeg, p)
    // prior degrees of the delta's endpoints (deletion orientation):
    // one filtered scan of the state, touched-sized result
    val degOld = materialize(
      prevEdgesDeg
        .join(hintIf(p.small)(p.endsChanged.select(col("node").as("src"))),
          Seq("src"), "left_semi")
        .groupBy(col("src")).agg(max(col("deg")).as("deg")))
    // canonical delta edges with the probe (lower-degree) endpoint
    // first; deg defaults 0 for endpoints absent from the degree
    // relation (an addition endpoint stranded in the prior state —
    // its adjacency is empty, probing it is free and correct)
    def oriented(deltaSym: DataFrame, endDeg: DataFrame): DataFrame = {
      val dc = deltaSym.filter(col("src") < col("dst"))
        .select(col("src").as("eu"), col("dst").as("ev"))
      dc.join(hintIf(p.small)(
            endDeg.select(col("src").as("eu"), col("deg").as("du"))),
          Seq("eu"), "left")
        .join(hintIf(p.small)(
            endDeg.select(col("src").as("ev"), col("deg").as("dv"))),
          Seq("ev"), "left")
        .select(col("eu"), col("ev"),
          when(coalesce(col("du"), lit(0L)) <= coalesce(col("dv"), lit(0L)),
            col("eu")).otherwise(col("ev")).as("pu"),
          when(coalesce(col("du"), lit(0L)) <= coalesce(col("dv"), lit(0L)),
            col("ev")).otherwise(col("eu")).as("po"))
    }
    // distinct triangles (sorted triples) with >= 1 delta edge, all
    // edges within `adj`: probe the delta edge's cheap endpoint for
    // w, then require the closing (other-endpoint, w) edge
    def triples(dc: DataFrame, adj: DataFrame): DataFrame = {
      val cand = dc.as("d")
        .join(adj.select(col("src").as("pu"), col("dst").as("w")),
          Seq("pu"))
        .filter(col("w") =!= col("po"))
      cand.join(adj.select(col("src").as("po"), col("dst").as("w")),
          Seq("po", "w"), "left_semi")
        .select(array_sort(array(col("eu"), col("ev"), col("w")))
          .as("t"))
        .distinct()
    }
    def corners(ts: DataFrame, sign: Int): DataFrame =
      ts.select(explode(col("t")).as("node"))
        .groupBy(col("node"))
        .agg((count(lit(1)) * sign).as("d"))
    val born = triples(oriented(p.dNew, p.touchedDeg), adjS)
    val dead = triples(oriented(p.dGone, degOld),
      prevEdgesDeg.select("src", "dst", "deg"))
    val delta = corners(born, 1).unionByName(corners(dead, -1))
      .groupBy(col("node")).agg(sum(col("d")).as("d"))
    uni.join(delta, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        (col("n_tri") + coalesce(col("d"), lit(0L))).as("n_tri"))
  }

  /** Link prediction over the similarity graph: score every
    * NON-adjacent pair by shared neighborhood — `cn` = common-neighbor
    * count, `ra_ppm` = the resource-allocation index (Zhou, Lü &
    * Zhang, "Predicting missing links via local information", EPJ B
    * 2009: Σ 1/deg(middle), which down-weights promiscuous middles)
    * scaled to integer parts-per-million (`div(1000000, deg)` summed)
    * so the score is engine-portable with no float summation order.
    * In a near-dup curation pipeline this surfaces the pairs the
    * miner's threshold MISSED: two docs sharing many near-dup
    * neighbors are near-dups the hamming cut split.
    *
    * Exact CN inherently enumerates every 2-path — Σ C(deg(m), 2)
    * wedges, quadratic in a hub's degree (the triangle census's
    * degree-ordered orientation does NOT apply: it keeps only the one
    * wedge per triangle whose edges both leave the pivot, undercounting
    * open wedges). The scale lever is `maxMiddleDegree`: middles above
    * the cap are excluded BEFORE the wedge join, bounding volume at
    * cap·Σdeg — at 100 TB a promiscuous middle contributes near-zero
    * RA mass (1e6/deg → 0) anyway, so capping changes little signal
    * for quadratically less work. The cap is part of the operator's
    * SEMANTICS (the oracle replicates it), not a silent approximation.
    * The cap is DEFAULT-ON (64, the bench semantics): the uncapped
    * sf0.1 near-dup graph already enumerates 301M wedges, so an
    * unbounded default is a scale hazard — pass `maxMiddleDegree = 0`
    * only as an explicit "I know this is quadratic in hub degree".
    *
    * One wedge join (shuffle on the middle id), one (id1, id2)
    * aggregate, one anti-join against the edge list; the pair miner
    * feeding `pairs` should be checkpointed by the caller when
    * expensive — this relation is scanned for edges and degrees. */
  def commonNeighbors(pairs: DataFrame, limit: Int = 50,
                      maxMiddleDegree: Int = 64): DataFrame = {
    require(maxMiddleDegree >= 0,
      "commonNeighbors: maxMiddleDegree must be >= 0 (0 = explicitly uncapped)")
    val e = canonicalEdges(pairs)
    val sym = symmetrize(e.select(col("a").as("id1"), col("b").as("id2")))
    val deg = sym.groupBy(col("src").as("m")).agg(count(lit(1)).as("deg"))
    val mids = if (maxMiddleDegree > 0) deg.filter(col("deg") <= maxMiddleDegree)
               else deg
    val adj = sym.join(mids.withColumnRenamed("m", "src"), "src")
    val scored = adj.alias("s1")
      .join(adj.alias("s2"), col("s1.src") === col("s2.src") &&
        col("s1.dst") < col("s2.dst"))
      .groupBy(col("s1.dst").as("id1"), col("s2.dst").as("id2"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div s1.deg")).as("ra_ppm"))
    scored.join(e,
        scored("id1") === e("a") && scored("id2") === e("b"), "left_anti")
      .orderBy(desc("cn"), desc("ra_ppm"), col("id1"), col("id2"))
      .limit(limit)
  }
}

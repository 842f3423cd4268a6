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
    * recomputation a lost executor could trigger at scale. */
  def pageRank(pairs: DataFrame, iterations: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "pageRank: need at least one iteration")
    require(dampNum > 0 && dampNum < dampDen, "pageRank: need 0 < damp < 1")
    require(checkpointEvery >= 1, "pageRank: checkpointEvery must be >= 1")
    // AQE off for the ITERATIONS (restored on exit): adaptive
    // execution re-plans and schedules a query stage per exchange,
    // and an iterative chain is many small exchanges whose contents
    // AQE can't improve (the rank vector's size is known and stable
    // after round 1) — the re-planning overhead is pure tax here.
    // Interleaved A/B at sf1: 11.8 s AQE-off vs 21.2 s AQE-on (min
    // of 2 each, one session). The final rank vector is materialized
    // INSIDE this scope so every iteration executes under it; the
    // caller's downstream plan (and any concurrent query started
    // after this returns) sees the session's normal AQE setting.
    val spark = pairs.sparkSession
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try pageRankLoop(pairs, iterations, dampNum, dampDen, scale,
      checkpointEvery)
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def pageRankLoop(pairs: DataFrame, iterations: Int,
                           dampNum: Long, dampDen: Long, scale: Long,
                           checkpointEvery: Int): DataFrame = {
    // materialize the INPUT first: `pairs` is typically an expensive
    // mining pipeline (LSH band expansion), and it appears twice in
    // the symmetrizing union — and `edges` twice more in the degree
    // self-join below. Without this the miner executed 4× before the
    // first checkpoint (round-6 soak: pagerank 16.0 s → the fix's
    // re-measure in ARCHITECTURE §7).
    val pairsM = materialize(pairs.select(col("id1"), col("id2")))
    val edges = pairsM.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairsM.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
    // degree travels WITH each edge: one materialized (src, dst, deg)
    // relation means each round is a single join + a single groupBy —
    // the division per edge row recomputes a per-src constant, which
    // is free next to the exchange it avoids. Materialized ALREADY
    // hash-partitioned on src (checkpoint preserves partitioning):
    // every round's join on e.src = p.node then satisfies its
    // distribution from the checkpointed layout, so only the rank
    // vector — |V| rows, not |E| — crosses the wire per round.
    val edgesDeg = materialize(edges.as("e")
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")).as("g"), "src")
      .repartition(col("src")))
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    // 1-row side, explicitly broadcast: the plan must never depend on
    // AQE noticing the single-row side of a cross join
    val nDf = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var pr = nodes.crossJoin(nDf)
      .select(col("node"), expr(s"$scale div n_nodes").as("pr"))
    for (i <- 1 to iterations) {
      // alias-qualified join: after round 1 the rank vector's lineage
      // contains edgesDeg itself, so unqualified Dataset-column
      // references would be ambiguous self-join attributes. Every node
      // of an undirected graph has in-edges, so the groupBy(dst)
      // already covers the full node set — no dangling-node re-join.
      pr = edgesDeg.as("e").join(pr.as("p"), col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .crossJoin(nDf)
        .select(col("dst").as("node"),
          (expr(s"($scale * ${dampDen - dampNum}) div $dampDen div n_nodes") +
            expr(s"($dampNum * in_sum) div $dampDen")).as("pr"))
      if (i % checkpointEvery == 0 && i < iterations) pr = materialize(pr)
    }
    // materialize the RESULT too: all iteration work must execute
    // inside pageRank's AQE-off scope, and the caller gets a
    // lineage-free |V|-row relation
    materialize(pr)
  }

  /** Triangle census of an undirected pair graph — the classic
    * cohesion statistic (and the textbook distributed-join graph
    * kernel, cf. Suri & Vassilvitskii, "Counting triangles and the
    * curse of the last reducer", WWW 2011). Edges canonicalize to
    * a < b exactly once; triangles enumerate as ordered wedges
    * a<b<c joined against the closing edge, so each triangle is
    * found EXACTLY once — no /3 correction, no double counting, and
    * every join is an equi-join Catalyst can plan freely.
    *
    * Scale: wedge count is Σ_v deg(v)² — the known hot spot is the
    * highest-degree node ("the last reducer"), the standard remedies
    * are degree-ordering (already: wedges pivot on the MIDDLE vertex
    * of the a<b<c order) and AQE skew splits. Output is one row
    * (n_nodes, n_edges, n_wedges, n_triangles, closure8 =
    * 3·triangles/wedges — the global clustering coefficient,
    * rational). */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val nodes = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v"))).distinct()
    // ordered wedges a<b<c: (a,b) joined to (b,c) on the middle vertex
    val wedges = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"),
        col("e2.b").as("wc"))
    val triangles = wedges.join(e.alias("e3"),
      col("wa") === col("e3.a") && col("wc") === col("e3.b"))
    // four 1-row aggregates crossed into one row: a single plan, no
    // driver-side count choreography
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
      .crossJoin(broadcast(triangles.agg(count(lit(1)).as("n_triangles"))))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(
          when(col("n_wedges") === 0L, 0.0)
            .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")),
          8).as("closure8"))
  }
}

package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline is brute-force cosine top-k: a broadcast of the (small)
  * query set against a full scan of the vector table — one pass, no
  * shuffle except the final per-query top-k. The scale path is IVF:
  * assign vectors to coarse centroids once (shuffle on centroid id),
  * then probe only matching cells — the probe join is an equi-join on
  * `centroid_id`, so at 100 TB it touches 1/nlist of the data per
  * query instead of everything.
  *
  * All vector math is double-precision sequential fold (Portable.dot)
  * and similarity is rounded before ranking, so results hash-match a
  * reference engine bit-for-bit.
  *
  * The IVF (inverted-file) structure follows the public ANN
  * literature (Jegou/Douze/Schmid, "Product quantization for nearest
  * neighbor search", TPAMI 2011 — coarse quantizer part; FAISS's
  * IndexIVFFlat is the reference shape).
  */
object Knn {

  /** See Dedup.spread — parallelize vector math past a single-file
    * scan. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Brute-force cosine top-k: queries = vec_id < nQueries (a
    * deterministic stand-in for an arbitrary query set). */
  def bruteForce(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val embeddings = spread(emb)
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cand = embeddings
      .select(col("vec_id"), col("embedding"))
    val scored = cand.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** Metadata-FILTERED top-k: neighbors restricted to vectors sharing
    * the query's `label` — the "filtered vector search" every
    * production retrieval system needs (tenant, language, license
    * gates). This is the PRE-filter strategy: the predicate gates
    * candidates BEFORE any similarity math, so selective filters cut
    * the scored set proportionally and recall is exact within the
    * filter by construction. (POST-filtering an unfiltered top-k is
    * the broken alternative — a k-list dominated by out-of-filter
    * neighbors silently returns fewer than k valid results.) At
    * index scale the same predicate pushes into the cell-partitioned
    * scan of [[IvfIndex.probe]] alongside the cell filter. */
  def filteredSearch(emb: DataFrame, nQueries: Int = 5,
                     k: Int = 5): DataFrame = {
    val embeddings = spread(emb)
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val scored = embeddings
      .join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("label"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("label"),
        col("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs: brute-force all-pairs as
    * the exactness baseline (top-k by similarity, deterministic
    * tiebreak). The scale path for 100 TB is NOT this — it is
    * Dedup.minhashPairs-style bucketing or ivfAssign cells; this
    * gives the ground truth those approximations are judged against.
    * Norms are precomputed per side so each pair costs one dot. */
  def nearDupPairs(emb: DataFrame, k: Int = 20): DataFrame = {
    val a = spread(emb).select(col("vec_id").as("id1"),
      col("embedding").as("e1"), l2norm(col("embedding")).as("nrm1"))
    val b = emb.select(col("vec_id").as("id2"),
      col("embedding").as("e2"), l2norm(col("embedding")).as("nrm2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(dot(col("e1"), col("e2")) / (col("nrm1") * col("nrm2")), 4)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** Vector norms — sanity/inspection projection. */
  def norms(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(l2norm(col("embedding")), 4).as("l2_norm"),
      col("label"))

  /** IVF coarse assignment: centroids = vectors with vec_id < nlist
    * (deterministic stand-in for trained centroids — the assignment
    * machinery, an argmax-join, is the real operator). Each vector maps
    * to its max-cosine centroid. */
  def ivfAssign(emb: DataFrame, nlist: Int = 16): DataFrame = {
    val embeddings = spread(emb)
    val cents = embeddings.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("centroid_id"))
    embeddings
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        cosine(col("embedding"), col("cvec")).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"),
        col("cos_sim").as("centroid_sim"))
  }

  /** SemDeDup-style semantic pruning (cluster embeddings, then drop
    * in-cluster near-duplicates — Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * 2023): every vector joins its max-cosine centroid's cell, and
    * inside each cell a vector is DROPPED when some LOWER-ID cell-mate
    * is at least `threshold`-similar — the min-id spine makes the kept
    * set a pure function of the data (no iteration order, no chains:
    * `kept_as` is the smallest qualifying id; kept = never blamed).
    *
    * Scale shape: pair expansion happens per cell over vec_id ARRAYS
    * (embeddings never ride the collected array — candidate pairs
    * join vectors back by key for their one cosine), and cell size is
    * the knob — SemDeDup's own regime raises the cluster count with
    * the corpus so cells stay bounded (measured at sf1: nlist 16→160
    * cuts 8.7 s → 3.3 s); centroids broadcast. The assignment's
    * exchange feeds both the cell grouping and the per-vector output
    * via Spark's ReuseExchange (asserted in specs), so the dominant
    * cross-join cosine pass runs once.
    *
    * `nlist <= 0` (the default) derives the cluster count from the
    * corpus: max(16, ⌈n/64⌉), holding the EXPECTED cell at ~64
    * vectors so in-cell pair expansion stays linear in n instead of
    * quadratic per cell. The one `count()` is a scalar driver read,
    * same cost class as the broadcast of the centroids. */
  def semanticPrune(emb: DataFrame, nlist: Int = 0,
                    threshold: Double = 0.9): DataFrame = {
    val nl = if (nlist > 0) nlist
             else math.max(16L, (emb.count() + 63L) / 64L).toInt
    val assigned = ivfAssign(emb, nl)
    // cells hold sorted vec_id ARRAYS only — embeddings never ride the
    // collect_list (a 10k-vector cell would otherwise replicate ~MBs
    // of float arrays per expanded pair row); candidate id pairs join
    // the vectors back by key for the one cosine they need
    val cells = assigned
      .groupBy(col("centroid_id"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
    val idPairs = cells
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("id1"), b.as("id2")))))).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
    val e1 = emb.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val e2 = emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val dropped = idPairs
      .join(e1, "id1").join(e2, "id2")
      .select(col("id1"), col("id2"),
        cosine(col("e1"), col("e2")).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("id2").as("vec_id"))
      .agg(min(col("id1")).as("kept_as"), max(col("sim")).as("dup_sim"))
    assigned.select(col("vec_id"), col("centroid_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"),
        col("kept_as").isNull.as("kept"), col("kept_as"), col("dup_sim"))
  }

  /** Deterministic broadcast Lloyd k-means — the TRAINED coarse
    * quantizer for IVF ([[ivfAssign]]'s hash-order centroids are the
    * untrained stand-in; this is the FAISS `train()` step). Classic
    * scale shape for small k: centroids live on the driver (k × dim
    * doubles), each iteration is one broadcast argmin-join + one
    * component-wise mean — no iterative lineage growth, no
    * driver-side data pull beyond k vectors.
    *
    * Deterministic by construction at ANY partitioning: init is the
    * k (hash52(vec_id), vec_id)-smallest vectors, assignment
    * tiebreaks on centroid_id, and means accumulate in
    * DECIMAL(28,12) so component sums are order-independent. A
    * cluster that loses all members keeps its previous centroid. */
  def kmeansCentroids(emb: DataFrame, k: Int = 8,
                      iters: Int = 4): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    var cents: Seq[(Int, Seq[Double])] = emb
      .orderBy(hash52(col("vec_id")), col("vec_id")).limit(k)
      .select(col("embedding")).collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).map(_.toDouble)) }
    for (_ <- 0 until iters) {
      val means = assignTo(spread(emb), cents)
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg((sum(col("v").cast("decimal(28,12)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("comps"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Row](1).map(_.getDouble(1)).toSeq)
        .toMap
      cents = cents.map { case (i, old) => (i, means.getOrElse(i, old)) }
    }
    cents
  }

  /** Nearest-centroid assignment (squared L2, centroid_id tiebreak)
    * against a driver-held centroid set. */
  private def assignTo(emb: DataFrame,
                       cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toDF("centroid_id", "cvec"))
    val d2 = aggregate(
      zip_with(col("embedding"), col("cvec"),
        (x, y) => { val d = x.cast("double") - y; d * d }),
      lit(0.0), (acc, v) => acc + v)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("centroid_id"))
    emb.crossJoin(cdf)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        d2.as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Public form of the argmin assignment for callers that already
    * hold trained centroids (e.g. [[IvfIndex.build]] — train once,
    * assign once, instead of re-running Lloyd per consumer). */
  def assignToCentroids(emb: DataFrame,
                        cents: Seq[(Int, Seq[Double])]): DataFrame =
    assignTo(spread(emb), cents)

  /** [[ivfAssign]] with TRAINED centroids: run [[kmeansCentroids]],
    * then assign every vector to its nearest learned centroid. */
  def ivfAssignTrained(emb: DataFrame, k: Int = 8,
                       iters: Int = 4): DataFrame = {
    val embeddings = spread(emb)
    assignTo(embeddings, kmeansCentroids(emb, k, iters))
      .select(col("vec_id"), col("centroid_id"), col("d2"))
  }

  /** Product quantization (Jegou/Douze/Schmid, TPAMI 2011 — the
    * compression half this module's header cites): split each vector
    * into `m` subvectors, k-means each subspace independently
    * ([[kmeansCentroids]] per slice), and store a vector as `m` small
    * centroid codes — dim × 4 bytes shrinks to m bytes at k ≤ 256,
    * the memory step that makes billion-vector ANN fit a cluster.
    *
    * Returns (codebooks, codes): codebooks(s) = that subspace's
    * centroid table (driver-held, m × k × dim/m doubles); codes = one
    * row per vector with an `array<int>` of length m. Deterministic
    * end-to-end (inherits [[kmeansCentroids]]' guarantees per
    * subspace). */
  def pqTrain(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 3)
      : (Seq[Seq[(Int, Seq[Double])]], DataFrame) = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // train each subspace on its slice; slice() is 1-based
    val books = (0 until m).map { s =>
      kmeansCentroids(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        k, iters)
    }
    // encode: per subspace, nearest sub-centroid id; join codes wide
    val codes = (0 until m).map { s =>
      assignTo(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        books(s))
        .select(col("vec_id"), col("centroid_id").as(s"c$s"))
    }.reduce(_.join(_, "vec_id"))
      .select(col("vec_id"),
        array((0 until m).map(s => col(s"c$s")): _*).as("codes"))
    (books, codes)
  }

  /** Asymmetric-distance (ADC) top-k: the query stays exact, each
    * candidate's distance is looked up per subspace from a
    * precomputed (query × codebook) distance table — m array lookups
    * + adds per candidate instead of a dim-length dot product. The
    * table ships as a plan literal (m × k doubles), so scoring runs
    * inside codegen over the compact codes column. */
  def pqSearch(codes: DataFrame, books: Seq[Seq[(Int, Seq[Double])]],
               query: Seq[Double], k: Int = 5): DataFrame = {
    val m = books.size
    val sub = query.size / m
    val table: Seq[Seq[Double]] = (0 until m).map { s =>
      val q = query.slice(s * sub, (s + 1) * sub)
      books(s).sortBy(_._1).map { case (_, c) =>
        c.zip(q).map { case (a, b) => val d = a - b; d * d }.sum
      }
    }
    val tLit = typedlit(table)
    val d2 = (0 until m).map(s =>
      element_at(element_at(tLit, s + 1),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    codes
      .select(col("vec_id"), d2.as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(k)
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket per vector
    * (Charikar, STOC 2002): bit p = sign(embedding · plane_p), planes
    * regenerated from the portable md5("p:d") formula
    * ([[graft.functions.RpLshBits.planeWeights]]). The dot
    * accumulates at DECIMAL scale 18 so the sign — and therefore the
    * bucket — never depends on summation order; the oracle's hash-agg
    * over unnested rows reaches the identical bit. A pure per-row
    * projection: scan-speed, no shuffle, 2^nPlanes buckets. Runs the
    * compiled [[graft.functions.RpLshBits]] kernel; the declarative
    * form below is the tested-equal reference. */
  def rpLshBuckets(emb: DataFrame, nPlanes: Int = 8,
                   dim: Int = 64): DataFrame =
    spread(emb).select(col("vec_id"),
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.RpLshBits(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            "embedding"),
          nPlanes, dim)).as("bucket"))

  /** Declarative HOF reference formulation of [[rpLshBuckets]] —
    * interpreted per element, kept for the equivalence test. */
  def rpLshBucketsHof(emb: DataFrame, nPlanes: Int = 8,
                      dim: Int = 64): DataFrame = {
    // DECIMAL(22,18): |product| ≤ 8, |sum| ≤ 512 — fits the 4 integer
    // digits; casting each fold step back to (22,18) keeps the SAME
    // scale, so no step ever rounds (a wider type like (38,18) would
    // widen to (38,17) per add and truncate a digit)
    val zero = lit(new java.math.BigDecimal(0)).cast("decimal(22,18)")
    val planes = graft.functions.RpLshBits.planeWeights(nPlanes, dim)
    val bits = (0 until nPlanes).map { p =>
      val w = array(planes(p).map(lit): _*)
      val s = aggregate(
        zip_with(col("embedding"), w,
          (x, wd) => (x.cast("double") * wd).cast("decimal(22,18)")),
        zero, (acc, v) => (acc + v).cast("decimal(22,18)"))
      when(s >= 0, "1").otherwise("0")
    }
    emb.select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  /** ANN search through the hyperplane buckets: candidates = vectors
    * sharing the query's bucket, re-ranked by exact cosine. The
    * bucket join is an equi-join (hash exchange, AQE-eligible) — at
    * scale each query touches ~|V| / 2^nPlanes vectors instead of
    * everything, trading recall for a tunable probe cost like the IVF
    * path. */
  def rpLshSearch(emb: DataFrame, nPlanes: Int = 8, nQueries: Int = 5,
                  k: Int = 3): DataFrame = {
    val sig = rpLshBuckets(emb, nPlanes) // spreads internally
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("bucket").as("qbucket"),
        col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    sig
      .join(broadcast(q), col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** IVF probe: answer queries by searching only their centroid's cell
    * (nprobe=1). Composes ivfAssign for both sides. */
  def ivfSearch(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3,
                nlist: Int = 16): DataFrame = {
    val assigned = ivfAssign(embeddings, nlist)
      .join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("centroid_id").as("qcell"),
        col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned
      .join(broadcast(q), col("centroid_id") === col("qcell") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** The delta-ingest invariant of an IVF index (FAISS's train/add
    * split): centroids trained on the BASE corpus stay frozen, a
    * later delta batch (vec_id % deltaMod == 0 here) is assigned to
    * those same frozen cells, and probing the grown index answers
    * from base+delta together. Expressed as one declarative query so
    * the DuckDB oracle can replay it: centroids come from the base
    * slice only, BOTH slices assign against them, and the probe is
    * [[ivfSearch]]'s single-cell shape over the union.
    * [[IvfIndex.append]] is the persisted form of the same contract;
    * its spec asserts probe-after-append finds the delta. */
  def ivfDeltaSearch(emb: DataFrame, deltaMod: Int = 5, nQueries: Int = 5,
                     k: Int = 3, nlist: Int = 16): DataFrame = {
    val embeddings = spread(emb)
    val isDelta = col("vec_id") % deltaMod === 0
    val cents = embeddings.filter(!isDelta && col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("centroid_id"))
    val assigned = embeddings
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine(col("embedding"), col("cvec")).as("cos_sim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("embedding"))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("centroid_id").as("qcell"),
        col("embedding").as("qvec"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned
      .join(broadcast(q), col("centroid_id") === col("qcell") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** Centroid-DRIFT report — the maintenance decision behind
    * [[IvfIndex.rebuild]] expressed declaratively (the oracle-checkable
    * twin, as [[ivfDeltaSearch]] is for [[IvfIndex.append]]): after a
    * delta batch (vec_id % deltaMod == 0) has been ingested into cells
    * formed from the BASE corpus's centroids, compare each cell's
    * population before a rebuild (frozen base centroids over
    * base+delta — the append steady state) against after (centroids
    * re-picked over the FULL corpus — the retrain). n_delta is the
    * add-log share per cell; |n_after − n_before| is the drift the
    * retrain corrects. Cells use the same first-nlist centroid
    * convention and cosine argmax as [[ivfAssign]]. */
  def ivfCompactionReport(emb: DataFrame, deltaMod: Int = 5,
                          nlist: Int = 16): DataFrame = {
    val embeddings = spread(emb)
    val isDelta = col("vec_id") % deltaMod === 0
    def cellsOf(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_sim").desc, col("centroid_id"))
      embeddings.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("centroid_id"),
          cosine(col("embedding"), col("cvec")).as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("centroid_id"))
    }
    val baseCents = embeddings.filter(!isDelta && col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val fullCents = embeddings.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val before = cellsOf(baseCents)
      .groupBy(col("centroid_id").as("cell"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("vec_id") % deltaMod === 0, 1L).otherwise(0L))
          .as("n_delta"))
    val after = cellsOf(fullCents)
      .groupBy(col("centroid_id").as("cell"))
      .agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
  }

  /** Recall@k of the IVF probe against the brute-force ground truth —
    * the measurement every ANN deployment needs BEFORE trading recall
    * for probe cost. Per query: |approx ∩ exact| / k over the same
    * k and tiebreak rules, so 1.0 means the probe's single cell held
    * the full true neighborhood. Queries the probe missed entirely
    * still report (recall 0), never drop. Both searches reuse their
    * shipped plans; the eval adds one tiny join + aggregate. */
  def recallAtK(embeddings: DataFrame, nQueries: Int = 5,
                k: Int = 3, nlist: Int = 16): DataFrame =
    recallAgainst(
      bruteForce(embeddings, nQueries, k),
      ivfSearch(embeddings, nQueries, k, nlist), k)

  /** [[recallAtK]] for the hyperplane-LSH search path — same ground
    * truth, same reporting; measures what the bucket equality gate
    * costs in recall at the configured plane count. */
  def lshRecallAtK(embeddings: DataFrame, nPlanes: Int = 8,
                   nQueries: Int = 5, k: Int = 3): DataFrame =
    recallAgainst(
      bruteForce(embeddings, nQueries, k),
      rpLshSearch(embeddings, nPlanes, nQueries, k), k)

  private def recallAgainst(exactTopK: DataFrame, approxTopK: DataFrame,
                            k: Int): DataFrame = {
    val exact = exactTopK.select(col("qid"), col("vec_id"))
    val approx = approxTopK.select(col("qid"), col("vec_id"))
    val hits = approx.join(exact, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / k, 4)
          .as("recall4"))
  }

  /** Per-label embedding diagnostics: mean-vector norm and intra-class
    * cohesion — the two numbers that say whether a label's region is
    * tight (high cohesion, norm near the members') or smeared (low
    * both), the health check run before trusting labels for filtered
    * search or stratified sampling.
    *
    * Exactness: per-dim sums accumulate in DECIMAL(22,18) (the RpLsh
    * pattern — double→decimal at scale 18 rounds identically across
    * engines, and both engines widen the SUM type, so no overflow);
    * cosine-to-centroid equals cosine-to-SUM-vector (the 1/n scaling
    * cancels in the ratio), so no decimal division exists anywhere —
    * the only divisions are double ops on identical inputs. The mean
    * norm reads sqrt(dot(S,S))/n.
    *
    * Shape: one (label, dim) exchange for the sums (labels×dims rows),
    * label-count-sized centroid relation broadcast back, one
    * per-member fused cosine pass, one label aggregate. */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val dims = spread(emb).select(col("label"), col("vec_id"),
      posexplode(col("embedding")).as(Seq("d", "x")))
    val sums = dims.groupBy(col("label"), col("d"))
      .agg(sum(col("x").cast("decimal(22,18)")).as("s"))
    val cent = sums.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        c => c.getField("s").cast("double")).as("svec"))
      .withColumn("norm_s", sqrt(dotFold(col("svec"), col("svec"))))
    // a perfectly-cancelling label (sum vector = 0) has no direction:
    // define its cohesion contribution as 0 rather than NaN-poisoning
    // the aggregate (and the oracle states the same CASE)
    val cosv = when(col("norm_s") === 0.0, lit(0.0))
      .otherwise(round(dotFold(col("embedding"), col("svec")) /
        (sqrt(dotFold(col("embedding"), col("embedding"))) *
          sqrt(dotFold(col("svec"), col("svec")))), 4))
    emb.select(col("label"), col("embedding"))
      .join(broadcast(cent), Seq("label"))
      .select(col("label"), col("norm_s"), cosv.as("cv"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(first(col("norm_s")) / count(lit(1)), 4).as("centroid_norm4"),
        round(sum(col("cv").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("cohesion4"))
  }

  /** MMR (maximal marginal relevance — Carbonell & Goldstein, SIGIR
    * 1998) diversified re-ranking: greedily pick k results where each
    * pick maximizes `relevance − max-similarity-to-already-picked`
    * (λ = 0.5, folded into integer arithmetic: with both terms on the
    * same scale the λ/(1−λ) weights cancel). The redundancy penalty is
    * what a plain top-k lacks — a near-dup-heavy corpus fills all k
    * slots with copies of the best hit; MMR returns one copy and
    * spends the rest of the budget on coverage.
    *
    * Scores are integer basis points: floor(round(cos, 4)·1e4 + 0.5)
    * — a deterministic function of the same doubles both engines
    * compute, so the greedy trajectory is engine-exact with no float
    * comparison anywhere. Ties break to the lower vec_id at every
    * step (including the first, which is pure relevance).
    *
    * Shape: the O(n) relevance pass ranks a top-`poolSize` candidate
    * pool per query (one window), the pool pairs with itself for the
    * O(poolSize²) similarity matrix, and the greedy loop runs inside
    * ONE `flatMapGroups` per query — per-group state is the pool's
    * integer matrix (bounded by poolSize², not corpus size), and
    * queries distribute across executors. This is the re-rank HEAD:
    * at 100 TB the candidate pool comes from the IVF/LSH paths and
    * poolSize stays O(100), so the quadratic term never sees the
    * corpus. The pool is checkpointed — the pair self-join reads it
    * twice and would otherwise re-run the relevance scan. */
  def mmrRerank(emb: DataFrame, nQueries: Int = 3, poolSize: Int = 30,
                k: Int = 10): DataFrame = {
    require(poolSize >= 2 && k >= 1 && k <= poolSize,
      s"mmrRerank: need 2 <= k <= poolSize, got k=$k pool=$poolSize")
    val session = emb.sparkSession
    import session.implicits._
    def bp(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + lit(0.5)).cast("long")
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = spread(emb).join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("embedding"),
        bp(cosine(col("qvec"), col("embedding"))).as("rel"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("vec_id"))
    val cand = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= poolSize)
      .select(col("qid"), col("vec_id"), col("embedding"), col("rel"))
      .localCheckpoint(true)
    val pairs = cand.alias("a").join(cand.alias("b"),
        col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.qid"), col("a.vec_id").as("va"), col("a.rel").as("rel"),
        col("b.vec_id").as("vb"),
        bp(cosine(col("a.embedding"), col("b.embedding"))).as("sim"))
      .as[(Long, Long, Long, Long, Long)]
    // Seed each group from the POOL relation, not only the pair join:
    // a 1-member pool has an empty pair self-join, and without these
    // rows flatMapGroups never sees the group at all — the query's
    // single candidate (rank 1) would be silently dropped. vb = -1 is
    // a sentinel (vec_ids are non-negative) carrying rel only.
    val seeds = cand.select(col("qid"), col("vec_id").as("va"), col("rel"),
        lit(-1L).as("vb"), lit(0L).as("sim"))
      .as[(Long, Long, Long, Long, Long)]
    seeds.union(pairs).groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rel = collection.mutable.LongMap.empty[Long]
      val sim = collection.mutable.HashMap.empty[(Long, Long), Long]
      it.foreach { case (_, va, ra, vb, s) =>
        rel(va) = ra; if (vb >= 0L) sim((va, vb)) = s
      }
      // ascending-id iteration + strict > keeps the LOWEST id on ties,
      // matching the oracle's (mmr DESC, vec_id ASC) row_number
      val remaining = collection.mutable.SortedSet.empty[Long] ++ rel.keys
      val selected = collection.mutable.ArrayBuffer.empty[Long]
      val out = collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
      var t = 1
      while (t <= k && remaining.nonEmpty) {
        var bestV = -1L
        var bestScore = Long.MinValue
        for (c <- remaining) {
          val pen = if (selected.isEmpty) 0L
            else selected.iterator.map(s0 => sim((c, s0))).max
          val sc = rel(c) - pen
          if (sc > bestScore) { bestScore = sc; bestV = c }
        }
        out += ((qid, t, bestV, bestScore))
        selected += bestV
        remaining -= bestV
        t += 1
      }
      out.iterator
    }.toDF("qid", "rnk", "vec_id", "mmr")
  }

  /** Mutual-kNN semantic clusters: the kNN-graph clustering step of
    * embedding-level curation (the structure behind SemDeDup-style
    * semantic dedup and density pruning — Abbas et al., "SemDeDup",
    * 2023 uses cluster-local neighbors the same way). Two vectors
    * join the graph only when each is in the OTHER's top-k — the
    * mutuality gate is what keeps hub vectors (near the centroid of a
    * dense region) from stitching unrelated regions into one blob,
    * the known failure of one-directional kNN graphs.
    *
    * Pipeline: per-vector top-k by rounded cosine (ties to the lower
    * id — fully deterministic), mutualize via self-join on the
    * reversed pair, then shape-independent connected components.
    * Every vector appears in the output; mutual isolates label
    * themselves (`cluster_id = vec_id`, `csize = 1`).
    *
    * This form scores all n² pairs — the measured-exact baseline, same
    * posture as [[bruteForce]] vs the IVF/LSH paths. At 100 TB the
    * top-k pass swaps for candidate generation from LSH buckets
    * ([[rpLshBuckets]]) or IVF cells ([[IvfIndex.probe]]) and the
    * mutualize + components tail is UNCHANGED — the tail only ever
    * sees n·k rows. The kNN relation is checkpointed: the mutualize
    * self-join reads it twice, and re-deriving it would re-run the n²
    * cosine pass both times. */
  def mutualKnnClusters(emb: DataFrame, k: Int = 5): DataFrame = {
    val e = spread(emb).select(col("vec_id"), col("embedding"))
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
    mutualTail(emb, topkOf(scored, k))
  }

  /** The 100 TB form of [[mutualKnnClusters]]: candidates come from
    * shared hyperplane-LSH buckets ([[rpLshBuckets]]) instead of the
    * full n² pass — a bucket-keyed equi-self-join, so pair volume is
    * Σ bucket² (tunable via `nPlanes`, ~|V|²/2^nPlanes expected) and
    * the join is an ordinary hash exchange, nothing broadcast-shaped.
    * Top-k, mutualize, and components are IDENTICAL to the exact
    * form — only candidate generation changes, which is the whole
    * point: recall loss is confined to pairs LSH never co-buckets
    * (same trade as [[rpLshSearch]] vs [[bruteForce]], measured by
    * `knn_recall_lsh`), while the mutuality gate and the cluster
    * semantics are untouched. */
  def mutualKnnClustersLsh(emb: DataFrame, nPlanes: Int = 8,
                           k: Int = 5): DataFrame = {
    val sig = rpLshBuckets(emb, nPlanes)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val scored = sig.alias("a").join(sig.alias("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vec_id"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos_sim"))
    mutualTail(emb, topkOf(scored, k))
  }

  /** Per-query top-k of a scored (qid, vec_id, cos_sim) relation —
    * rounded-cosine order, ties to the lower id, checkpointed because
    * the mutualize self-join reads it twice. */
  private def topkOf(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint(true)
  }

  /** Mutualize + components + full labeling: edges only where both
    * endpoints picked each other; every vector labeled, isolates as
    * singleton clusters with their own id. */
  private def mutualTail(emb: DataFrame, knn: DataFrame): DataFrame = {
    val mutual = knn.alias("x").join(knn.alias("y"),
        col("x.qid") === col("y.vec_id") && col("x.vec_id") === col("y.qid") &&
        col("x.qid") < col("x.vec_id"))
      .select(col("x.qid").as("id1"), col("x.vec_id").as("id2"))
    val comp = graft.operators.GraphOps.connectedComponents(mutual)
      .withColumnRenamed("doc_id", "vec_id")
    val labeled = emb.select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("csize"))
    labeled.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("csize"))
  }
}

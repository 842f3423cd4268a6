package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Lexical retrieval + rank fusion — the RAG-side counterpart of the
  * ANN stack in [[graft.similarity.Knn]]: score documents against a
  * small query set (BM25 family) and fuse lexical with semantic
  * rankings (reciprocal-rank fusion), all oracle-exact.
  *
  * Portability decisions (the repo-wide no-libm rule):
  *  - idf is the RATIONAL Robertson form `(N − df + 0.5)/(df + 0.5)`
  *    without the log wrapper: log is not correctly rounded and
  *    differs across libm implementations. Per term the rational form
  *    is a monotone transform of log-idf (same per-term ordering);
  *    the summed document score is a well-defined scoring function in
  *    its own right — what the gate needs is that BOTH engines
  *    compute the identical value, which exact conversions and
  *    correctly-rounded IEEE ops guarantee.
  *  - k1/b DEFAULTS ARE BINARY-EXACT doubles (1.25, 0.75): every
  *    engine parses these decimal literals to the same double, where
  *    1.2 + 1.0 computed in one engine's double vs 2.2 parsed in
  *    another's decimal could differ in the last ulp.
  *  - per-term weights round at 4 decimals then sum in DECIMAL(18,4),
  *    so the aggregation is order-independent (double addition is
  *    not associative; decimal addition is).
  */
object Retrieval {

  /** See Dedup.spread — parallelize per-row text work past a
    * single-file scan. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** BM25-scored top-k documents per query.
    *
    * Plan shape, scan-out-first: the distinct query vocabulary
    * broadcasts into the token explode, so term frequencies are
    * aggregated over query-vocab tokens only — the corpus-sized
    * explode feeds ONE exchange, which AQE reuses for the df branch
    * (same subtree, ReusedExchange — asserted in PlanSpec). Document
    * frequencies and corpus stats are vocabulary-sized / single-row
    * and broadcast back; the per-query ranking is a rank-filter
    * window pruned by InferWindowGroupLimit. Nothing driver-side, no
    * all-pairs: at 100 TB this is one corpus pass plus query-vocab-
    * sized small tables. */
  def bm25(docs: DataFrame, queries: DataFrame, k1: Double = 1.25,
           b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(topK > 0, "need topK > 0")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val qterms = queries.select(col("qid"),
      explode(tokens(col("query"))).as("term"))
    val qvocab = qterms.select(col("term")).distinct()
    val toks = spread(docs).select(col("doc_id"),
        size(tokens(col("text"))).as("dl"),
        explode(tokens(col("text"))).as("term"))
      .join(broadcast(qvocab), "term")
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs
      .select(size(tokens(col("text"))).cast("long").as("dl0"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl0")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    val norm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)
    val wTerm = round(
      idf * ((tfd * lit(k1 + 1.0)) / (tfd + lit(k1) * norm)), 4)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w_term", wTerm.cast("decimal(18,4)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("w_term")).cast("double"), 4).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("doc_id"), col("score"))
  }

  /** [[bm25]] with PER-TERM WEIGHTS: `termWeights` is (qid, term,
    * weight_ppm) and a document's score is
    * `round(Σ_t weight_ppm(t)·w_term(t,d) / 10⁶, 4)` — the weighted
    * query-likelihood shape RM3 interpolation needs, where plain
    * bm25 is the all-weights-equal special case (up to the 10⁶
    * scaling). The per-term kernel `w_term` (idf × saturation,
    * rounded to 4 dp) is IDENTICAL to [[bm25]]'s; the weighting
    * enters only the final aggregate, as an exact decimal×long
    * product summed in decimal and floated once for the final
    * 4-dp round — the same portable-determinism recipe as the
    * unweighted score, replicated by the DuckDB oracle.
    *
    * Plan shape is [[bm25]]'s, unchanged: the weight rides the
    * already-broadcast (qid, term) relation into the final
    * vocabulary-sized join — one corpus pass, no new exchange. */
  def bm25Weighted(docs: DataFrame, termWeights: DataFrame,
                   k1: Double = 1.25, b: Double = 0.75,
                   topK: Int = 10): DataFrame = {
    require(topK > 0, "need topK > 0")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val qterms = termWeights.select(col("qid"), col("term"),
      col("weight_ppm"))
    val qvocab = qterms.select(col("term")).distinct()
    val toks = spread(docs).select(col("doc_id"),
        size(tokens(col("text"))).as("dl"),
        explode(tokens(col("text"))).as("term"))
      .join(broadcast(qvocab), "term")
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs
      .select(size(tokens(col("text"))).cast("long").as("dl0"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl0")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    val norm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)
    val wTerm = round(
      idf * ((tfd * lit(k1 + 1.0)) / (tfd + lit(k1) * norm)), 4)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w_term", wTerm.cast("decimal(18,4)"))
      .groupBy(col("qid"), col("doc_id"))
      // weight as decimal(7,0) (≤ 10⁶ by construction): the product
      // decimal(25,4) stays exact — and WIDTH-PORTABLE — in both
      // Spark and the DuckDB oracle; one float + one round at the end
      .agg(round((sum(col("w_term") *
          col("weight_ppm").cast("decimal(7,0)")).cast("double") /
        lit(1000000.0)), 4).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("doc_id"), col("score"))
  }

  /** RM3-style anchored expansion weights (Abdul-Jaleel et al.,
    * "UMass at TREC 2004"): the fix for the topic drift
    * the tf-graded PRF eval MEASURED in round 12 (un-anchored
    * expansion cost −141 478 ppm nDCG on q1) — interpolate the
    * ORIGINAL query model with weight λ over the expansion model at
    * 1−λ instead of appending expansion terms at equal footing.
    * Returns (qid, term, weight_ppm) for [[bm25Weighted]]:
    *
    *  - original terms: `λ_ppm · (tf_q·10⁶ div |q|) div 10⁶`
    *    (P(t|q) = query term frequency over query length),
    *  - expansion terms: `(10⁶−λ_ppm) · weight_ppm div 10⁶` over
    *    [[expandTerms]]' top terms (whose weight_ppm is already the
    *    pool relevance-model estimate P(t|R) = pool_tf/pool_len).
    *
    * The two sets are disjoint by expandTerms' anti-join, so each
    * (qid, term) carries exactly one weight; an original term's
    * (usually tiny) P(t|R) mass is dropped rather than summed —
    * the standard simplification when the expansion list is
    * truncated to top-k terms anyway. All integer ppm arithmetic,
    * floor divisions in a fixed order, oracle-replicable.
    *
    * The result is query-set-sized but its lineage embeds
    * expandTerms' corpus passes, and [[bm25Weighted]] evaluates its
    * query side through non-identical subtrees (qvocab, qterms) that
    * exchange reuse cannot dedupe — localCheckpoint for the same
    * measured reason as [[expandedQueries]]. */
  def rm3Weights(docs: DataFrame, queries: DataFrame,
                 lambdaPpm: Long = 600000L, topKDocs: Int = 10,
                 minPoolDf: Int = 2, topTerms: Int = 5): DataFrame =
    rm3WeightsFrom(queries,
      expandTerms(docs, queries, topKDocs, minPoolDf, topTerms),
      lambdaPpm)

  /** [[rm3Weights]] over a PRECOMPUTED [[expandTerms]] relation —
    * the sharing seam for evals that consume the same feedback pool
    * through several treatments (`ret_expand_ab_eval` derives the
    * un-anchored rewrite AND the RM3 weights from ONE expandTerms
    * run instead of re-running its two corpus passes per
    * treatment). Callers should localCheckpoint `exp` — its lineage
    * embeds those passes. */
  def rm3WeightsFrom(queries: DataFrame, exp: DataFrame,
                     lambdaPpm: Long = 600000L): DataFrame = {
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      "rm3Weights: lambdaPpm must be in [0, 1e6]")
    val qtoks = queries.select(col("qid"),
      explode(tokens(col("query"))).as("term"))
    val qlen = qtoks.groupBy(col("qid")).agg(count(lit(1)).as("q_len"))
    val orig = qtoks.groupBy(col("qid"), col("term"))
      .agg(count(lit(1)).as("tf_q"))
      .join(broadcast(qlen), Seq("qid"))
      .select(col("qid"), col("term"),
        expr(s"$lambdaPpm * (tf_q * 1000000 div q_len) div 1000000")
          .as("weight_ppm"))
    val e = exp
      .select(col("qid"), col("term"),
        expr(s"(${1000000L - lambdaPpm} * weight_ppm) div 1000000")
          .as("weight_ppm"))
    orig.unionByName(e).localCheckpoint()
  }

  /** Cosine top-k per query over an id-keyed vector table, with an
    * explicit (qid → vector id) mapping — the semantic side of hybrid
    * retrieval, shaped like Knn.bruteForce but addressable by query
    * id so it can be rank-fused with a lexical ranking. Query vectors
    * broadcast (k × dim floats); candidates stream through one scan;
    * per-query ranking is a rank-filter window. The query vector
    * itself is excluded from its own result. */
  def semanticTopK(emb: DataFrame, queryVecs: Map[Long, Long],
                   topK: Int = 10): DataFrame = {
    require(queryVecs.nonEmpty && topK > 0, "need queries and topK > 0")
    val spark = emb.sparkSession
    import spark.implicits._
    val qmap = queryVecs.toSeq.sorted.toDF("qid", "vid")
    val qv = emb.join(broadcast(qmap), col("vec_id") === col("vid"))
      .select(col("qid"), col("vid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    emb.join(broadcast(qv), col("vec_id") =!= col("vid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fused score = Σ over systems of `1/(k + rank)`. Rank-based, so
    * the two systems' score scales never need calibrating — the
    * classic lexical+semantic hybrid-retrieval combiner. Each side
    * contributes one correctly-rounded IEEE division; a full-outer
    * join on (qid, item) lets an item ranked by only one system keep
    * its single contribution (coalesce fixes the addition order, so
    * the two-term sum is deterministic). Both inputs are already
    * top-k (small per query); the join and re-rank are
    * query-set-sized, not corpus-sized. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60,
              topK: Int = 10): DataFrame = {
    require(k >= 0 && topK > 0, "need k >= 0, topK > 0")
    def side(df: DataFrame, out: String) = df.select(col("qid"), col("item"),
      (lit(1.0) / (col("rnk") + lit(k)).cast("double")).as(out))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("item"))
    side(a, "ra").join(side(b, "rb"), Seq("qid", "item"), "full_outer")
      .withColumn("rrf", round(
        coalesce(col("ra"), lit(0.0)) + coalesce(col("rb"), lit(0.0)), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("item"), col("rrf"))
  }

  /** Deterministic relevance judgments for ranking evaluation: a doc
    * is relevant to a query iff it contains at least `minTerms`
    * DISTINCT query terms — boolean multi-term containment, the
    * standard pooling stand-in when no human qrels exist. Same
    * scan-out-first shape as [[bm25]]: the query vocabulary
    * broadcasts into the corpus token explode, so the distinct and
    * the (qid, doc) aggregate only ever see query-vocab tokens. */
  def qrelsByTermOverlap(docs: DataFrame, queries: DataFrame,
                         minTerms: Int = 2): DataFrame =
    qrelsGraded(docs, queries, minTerms).select(col("qid"), col("doc_id"))

  /** Graded variant of [[qrelsByTermOverlap]]: the relevance GRADE is
    * the distinct-query-term-overlap count itself — the judgment the
    * boolean form thresholds away, and exactly what graded metrics
    * (nDCG) need. Same single corpus pass. */
  def qrelsGraded(docs: DataFrame, queries: DataFrame,
                  minTerms: Int = 2): DataFrame = {
    require(minTerms >= 1, "need minTerms >= 1")
    val qterms = queries.select(col("qid"),
      explode(tokens(col("query"))).as("term")).distinct()
    val qvocab = qterms.select(col("term")).distinct()
    spread(docs).select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .join(broadcast(qvocab), "term").distinct()
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_match"))
      .filter(col("n_match") >= minTerms)
      .select(col("qid"), col("doc_id"),
        col("n_match").cast("long").as("grade"))
  }

  /** Ranking-quality evaluation — precision@5/@10, recall@10, and MRR
    * per query, all in integer parts-per-million (`div` floor
    * division) so the metrics are engine-portable with no float
    * ratio: the retrieval twin of the ANN family's `knn_recall`
    * evals, closing the measure-don't-guess loop for the lexical
    * stack. `results` is a (qid, rnk, doc_id) ranking (rnk 1-based,
    * already top-k); `qrels` is the (qid, doc_id) relevant set.
    * Queries with no relevant docs report zeros rather than
    * vanishing, and unjudged rankings score 0 — absence is signal.
    * The evaluation depth is capped at `depth` (default 10) INSIDE
    * the operator: rankings deeper than the cap are truncated before
    * any metric, so `first_rel` (hence MRR) can never reflect a rank
    * beyond what precision@k sees, for any caller depth.
    *
    * Scale: `results` is top-k-sized (queries × k rows); only qrel
    * construction touches the corpus. One semi-join + two grouped
    * aggregates, everything keyed by qid. */
  def rankEval(results: DataFrame, qrels: DataFrame,
               depth: Int = 10): DataFrame = {
    require(depth >= 5, "need depth >= 5 (p@5 is reported)")
    val capped = results.filter(col("rnk") <= depth)
    val nrel = qrels.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val hits = capped.join(qrels, Seq("qid", "doc_id"), "left_semi")
      .groupBy(col("qid")).agg(
        sum(when(col("rnk") <= 5, 1L).otherwise(0L)).as("hits_5"),
        sum(when(col("rnk") <= 10, 1L).otherwise(0L)).as("hits_10"),
        min(col("rnk")).cast("long").as("first_rel"))
    capped.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .join(nrel, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits_5"), lit(0L)).as("hits_5"),
        coalesce(col("hits_10"), lit(0L)).as("hits_10"),
        expr("coalesce(hits_5, 0L) * 1000000 div 5").as("p5_ppm"),
        expr("coalesce(hits_10, 0L) * 1000000 div 10").as("p10_ppm"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("coalesce(hits_10, 0L) * 1000000 div n_rel"))
          .as("r10_ppm"),
        when(col("first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 div first_rel")).as("mrr_ppm"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM1 relevance-
    * model shape, Lavrenko & Croft SIGIR'01, with the integer-exact
    * estimator this repo's gate demands): retrieve each query's
    * [[bm25]] top-`topKDocs` feedback pool, then rank the pool's
    * vocabulary by its maximum-likelihood weight under the pool
    * language model — `weight_ppm = floor(10⁶ · pool_tf /
    * pool_len)`, i.e. P(term | pool) in parts-per-million — keeping
    * terms that appear in ≥ `minPoolDf` distinct pool docs (the
    * classic one-outlier-doc guard) and dropping the original query
    * terms. Top `topTerms` per query by (weight, term).
    *
    * Why ML-in-ppm and not log-space RM1: the ranking only needs the
    * per-query monotone order of P(term|pool), which the integer
    * floor division preserves; logs are libm and would break the
    * exact-hash gate for zero ranking benefit.
    *
    * Plan shape: retrieval is [[bm25]]'s one corpus pass; the pool
    * (|Q|·topKDocs ids) broadcasts into a SECOND corpus scan that
    * tokenizes ONLY pool docs (the hash-join filter prunes before
    * the explode, so pass 2's token work is pool-sized). Everything
    * after — pool lengths, candidate counts, the rank window — is
    * keyed by qid and pool-sized. PRF is inherently two-pass
    * (retrieve, then read what you retrieved); nothing here is
    * corpus-sized past the two scans. */
  def expandTerms(docs: DataFrame, queries: DataFrame,
                  topKDocs: Int = 10, minPoolDf: Int = 2,
                  topTerms: Int = 5): DataFrame = {
    require(topKDocs > 0 && minPoolDf >= 1 && topTerms > 0,
      "need topKDocs > 0, minPoolDf >= 1, topTerms > 0")
    val pool = bm25(docs, queries, topK = topKDocs)
      .select(col("qid"), col("doc_id"))
    val poolToks = spread(docs).join(broadcast(pool), "doc_id")
      .select(col("qid"), col("doc_id"),
        explode(tokens(col("text"))).as("term"))
    val poolLen = poolToks.groupBy(col("qid"))
      .agg(count(lit(1)).as("pool_len"))
    val qterms = queries.select(col("qid"),
      explode(tokens(col("query"))).as("term")).distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("weight_ppm").desc, col("term"))
    poolToks.groupBy(col("qid"), col("term"))
      .agg(count(lit(1)).as("pool_tf"),
        countDistinct(col("doc_id")).as("pool_df"))
      .filter(col("pool_df") >= minPoolDf)
      .join(broadcast(qterms), Seq("qid", "term"), "left_anti")
      .join(broadcast(poolLen), Seq("qid"))
      .withColumn("weight_ppm", expr("pool_tf * 1000000 div pool_len"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topTerms)
      .select(col("qid"), col("rnk"), col("term"),
        col("pool_tf"), col("pool_df"), col("weight_ppm"))
  }

  /** Frequency-graded variant of [[qrelsGraded]]: the grade is the
    * TOTAL query-term occurrence count in the doc (capped at
    * `gradeCap`, the [[ndcg]] gain cap), still gated on ≥ `minTerms`
    * DISTINCT terms. The distinct-overlap grade of [[qrelsGraded]]
    * saturates nDCG on corpora where max-overlap docs outnumber the
    * ranking depth (every top-10 drawn from them is ideal — the
    * measured `ret_expand_eval` result); occurrence counts spread
    * the judged pool across 9 grade levels, so ranking CHANGES move
    * the metric. Same single corpus pass. */
  def qrelsGradedByTf(docs: DataFrame, queries: DataFrame,
                      minTerms: Int = 2, gradeCap: Int = 9): DataFrame = {
    require(minTerms >= 1 && gradeCap >= 1, "need minTerms, gradeCap >= 1")
    val qterms = queries.select(col("qid"),
      explode(tokens(col("query"))).as("term")).distinct()
    val qvocab = qterms.select(col("term")).distinct()
    spread(docs).select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .join(broadcast(qvocab), "term")
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(countDistinct(col("term")).as("nd"),
        count(lit(1)).as("tf"))
      .filter(col("nd") >= minTerms)
      .select(col("qid"), col("doc_id"),
        least(col("tf"), lit(gradeCap.toLong)).as("grade"))
  }

  /** The PRF loop CLOSED: rewrite each query as (original terms ∪
    * its [[expandTerms]] top terms), returning the same (qid, query)
    * shape [[bm25]] consumes — so "expansion worked" is measurable
    * as a before/after ranking-metric delta instead of an unconsumed
    * term list. The rebuilt string appends expansion terms in
    * expansion-rank order (deterministic; bm25 scoring is
    * order-insensitive — it sees the token multiset, and
    * expandTerms' anti-join guarantees expansion terms are disjoint
    * from the original terms, so no token is doubled). A query with
    * no surviving expansion terms passes through unchanged (the
    * `when` guard — naive concat would append a trailing separator
    * and tokenize an empty term). Cost: [[expandTerms]]' two corpus
    * passes; the rewrite itself is query-set-sized. */
  def expandedQueries(docs: DataFrame, queries: DataFrame,
                      topKDocs: Int = 10, minPoolDf: Int = 2,
                      topTerms: Int = 5): DataFrame =
    expandedQueriesFrom(queries,
      expandTerms(docs, queries, topKDocs, minPoolDf, topTerms))

  /** [[expandedQueries]] over a PRECOMPUTED [[expandTerms]] relation
    * — the same sharing seam as [[rm3WeightsFrom]]. */
  def expandedQueriesFrom(queries: DataFrame, exp: DataFrame): DataFrame = {
    val ext = exp.groupBy(col("qid")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("term")))),
        x => x("term")), " ").as("ext"))
    // materialize the (query-set-sized) rewrite: its LINEAGE embeds
    // expandTerms' two corpus passes, and a downstream [[bm25]]
    // evaluates its query side through several non-identical
    // subtrees (qterms, qvocab) that exchange reuse cannot dedupe —
    // without the cut, each re-derivation replays the corpus scans
    // (measured on ret_expand_eval: 7.95 → 4.57 s interleaved min)
    queries.join(broadcast(ext), Seq("qid"), "left")
      .select(col("qid"),
        when(col("ext").isNull, col("query"))
          .otherwise(concat_ws(" ", col("query"), col("ext")))
          .as("query"))
      .localCheckpoint()
  }

  /** Frozen integer discounts for nDCG: floor(10⁶ / log₂(r+1)) for
    * ranks 1-10, precomputed as constants because log₂ is a libm call
    * whose low bits vary by engine (the `qc_benford` trick applied to
    * ranks — frozen log constants, integer arithmetic after). */
  private val NdcgDiscountPpm: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /** nDCG@depth with graded relevance, entirely in integer
    * arithmetic: gain(g) = 2^min(g,9) − 1 (the standard exponential
    * gain; the cap bounds every product so dcg·10⁶ stays below 2⁵³ —
    * the portable-exactness envelope), discount = the frozen
    * [[NdcgDiscountPpm]] constants, `ndcg_ppm = dcg·10⁶ div idcg`.
    * `results` is a (qid, rnk, doc_id) ranking; `qrels` is graded —
    * (qid, doc_id, grade) from [[qrelsGraded]]. The ideal ranking
    * (IDCG) orders each query's judged docs by grade descending
    * (doc_id tiebreak — tie ORDER doesn't change the IDCG value,
    * equal grades have equal gains). Queries with no judged docs
    * report 0 — absence is signal, matching [[rankEval]].
    *
    * Scale: `results` is top-k-sized; qrels are judged-pool-sized.
    * One keyed join + one per-qid window + two grouped aggregates,
    * everything keyed by qid — nothing corpus-sized. */
  def ndcg(results: DataFrame, qrels: DataFrame,
           depth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= NdcgDiscountPpm.size,
      s"frozen discounts cover ranks 1-${NdcgDiscountPpm.size}")
    val capped = results.filter(col("rnk") <= depth)
    def disc = element_at(
      array(NdcgDiscountPpm.map(lit): _*), col("rnk").cast("int"))
    def gain = expr(
      "shiftleft(CAST(1 AS BIGINT), CAST(least(grade, 9) AS INT)) - 1")
    val dcg = capped.join(qrels, Seq("qid", "doc_id"))
      .select(col("qid"), (gain * disc).as("term"))
      .groupBy(col("qid")).agg(sum(col("term")).as("dcg_ppm"))
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("grade").desc, col("doc_id"))
    val idcg = qrels
      .withColumn("rnk", row_number().over(wIdeal))
      .filter(col("rnk") <= depth)
      .select(col("qid"), (gain * disc).as("term"))
      .groupBy(col("qid")).agg(sum(col("term")).as("idcg_ppm"))
    capped.select(col("qid")).distinct()
      .join(dcg, Seq("qid"), "left")
      .join(idcg, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("dcg_ppm"), lit(0L)).as("dcg_ppm"),
        coalesce(col("idcg_ppm"), lit(0L)).as("idcg_ppm"),
        when(coalesce(col("idcg_ppm"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr(
            "coalesce(dcg_ppm, 0L) * 1000000 div idcg_ppm"))
          .as("ndcg_ppm"))
  }
}

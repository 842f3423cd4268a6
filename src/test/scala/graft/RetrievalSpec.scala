package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "apple apple banana fig"),          // tf(apple)=2, dl=4
    (1L, "apple banana fig cherry"),         // tf(apple)=1, dl=4
    (2L, "banana fig cherry date"),          // no apple
    (3L, "apple"),                           // tf=1, dl=1 (short doc boost)
    (4L, "kiwi lime mango papaya"))
    .toDF("doc_id", "text")
  private val queries = Seq((1L, "apple")).toDF("qid", "query")

  test("bm25: more matches rank higher; non-matching docs absent") {
    val got = Retrieval.bm25(docs, queries).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._3).toSet == Set(0L, 1L, 3L)) // docs with 'apple'
    // doc 3 (dl=1): tf-norm ≈ tf/(tf + k1·small) beats doc 0's dl=4
    // but both beat doc 1 (tf=1, dl=4)
    assert(got.last._3 == 1L, s"tf=1/dl=4 must rank last: ${got.toSeq}")
    // scores strictly ordered with rank
    assert(got.map(_._4).zip(got.tail.map(_._4)).forall(p => p._1 >= p._2))
  }

  test("bm25 score matches the closed-form arithmetic") {
    val got = Retrieval.bm25(docs, queries).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // N=5, df=3, sum_dl=17, avgdl=17/5; k1=1.25, b=0.75
    val n = 5.0; val df = 3.0; val avgdl = 17.0 / 5.0
    def w(tf: Double, dl: Double): Double = {
      val idf = (n - df + 0.5) / (df + 0.5)
      val norm = 0.25 + 0.75 * (dl / avgdl)
      val t = idf * ((tf * 2.25) / (tf + 1.25 * norm))
      math.rint(t * 1e4) / 1e4
    }
    assert(got(0L) == w(2, 4), s"doc0: ${got(0L)} vs ${w(2, 4)}")
    assert(got(3L) == w(1, 1), s"doc3: ${got(3L)} vs ${w(1, 1)}")
  }

  test("bm25 multi-term query sums per-term weights; invariant to partitioning") {
    val q2 = Seq((7L, "apple cherry")).toDF("qid", "query")
    def rows(d: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25(d, q2).orderBy("rnk").collect().map(_.toSeq).toSeq
    val base = rows(docs)
    assert(rows(docs.repartition(7)) == base)
    // doc 1 matches both terms — must beat every single-term doc
    assert(base.head(2) == 1L)
  }

  test("semanticTopK: identical vector ranks first, self excluded") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), // 1 duplicates 0
      (2L, Array(0f, 1f)), (3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.semanticTopK(emb, Map(5L -> 0L), topK = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.forall(_._1 == 5L))
    assert(!got.exists(_._3 == 0L), "query vector must not match itself")
    assert(got.head._3 == 1L && got.head._4 == 1.0)
  }

  test("rrf: items ranked by both systems beat single-system items; exact values") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "item", "rnk")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("qid", "item", "rnk")
    val got = Retrieval.rrfFuse(a, b).orderBy("rnk").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    def rr(r: Int) = 1.0 / (r + 60)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.head == ((10L, r6(rr(1) + rr(2))))) // both systems
    assert(got.map(_._1).toSeq == Seq(10L, 12L, 11L))
    assert(got(1) == ((12L, r6(rr(1)))))
    assert(got(2) == ((11L, r6(rr(2)))))
  }

  test("bm25: queries with only out-of-vocabulary terms return no rows") {
    val q = Seq((9L, "zzz qqq")).toDF("qid", "query")
    assert(Retrieval.bm25(docs, q).count() == 0)
  }

  test("bm25: an absent query term contributes nothing (scores unchanged)") {
    val mixed = Retrieval.bm25(docs, Seq((9L, "apple zzz"))
      .toDF("qid", "query")).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    val pure = Retrieval.bm25(docs, Seq((9L, "apple"))
      .toDF("qid", "query")).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(mixed == pure)
  }

  test("rrf fusion of bm25 + semantic is partitioning-invariant") {
    val emb = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 10).toFloat)))
      .toDF("vec_id", "embedding")
    def fused(d: org.apache.spark.sql.DataFrame,
              e: org.apache.spark.sql.DataFrame) = {
      val lex = Retrieval.bm25(d, queries)
        .select(col("qid"), col("doc_id").as("item"), col("rnk"))
      val sem = Retrieval.semanticTopK(e, Map(1L -> 0L), topK = 5)
        .select(col("qid"), col("vec_id").as("item"), col("rnk"))
      Retrieval.rrfFuse(lex, sem).orderBy("qid", "rnk")
        .collect().map(_.toSeq).toSeq
    }
    assert(fused(docs, emb) == fused(docs.repartition(5), emb.repartition(3)))
  }

  test("rankEval: hand-computed precision/recall/MRR in ppm") {
    // q1: relevant docs {10, 20, 30}; ranking hits 10 at rank 2 and
    // 30 at rank 7 → hits_5 = 1, hits_10 = 2, p5 = 1/5, p10 = 2/10,
    // recall = 2/3, mrr = 1/2
    val results = (1 to 10).map(r =>
        (1L, r, if (r == 2) 10L else if (r == 7) 30L else r * 100L))
      .toDF("qid", "rnk", "doc_id")
    val qrels = Seq((1L, 10L), (1L, 20L), (1L, 30L)).toDF("qid", "doc_id")
    val m = Retrieval.rankEval(results, qrels).head()
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) == (3L, 1L, 2L))
    assert(m.getLong(4) == 200000L && m.getLong(5) == 200000L)
    assert(m.getLong(6) == 666666L, "recall 2/3 floors to 666666 ppm")
    assert(m.getLong(7) == 500000L, "first relevant at rank 2")
  }

  test("rankEval: no relevant docs and unjudged rankings report zeros") {
    val results = Seq((1L, 1, 100L), (1L, 2, 200L)).toDF("qid", "rnk", "doc_id")
    val none = Retrieval.rankEval(results,
      Seq.empty[(Long, Long)].toDF("qid", "doc_id")).head()
    assert((2 to 7).forall(i => none.getLong(i) == 0L),
      "empty qrels: every metric is 0, the query row still reports")
    // judged for a DIFFERENT query only: still zeros for q1
    val other = Retrieval.rankEval(results,
      Seq((9L, 100L)).toDF("qid", "doc_id"))
      .filter(col("qid") === 1L).head()
    assert((2 to 7).forall(i => other.getLong(i) == 0L))
  }

  test("rankEval caps evaluation depth INSIDE the operator " +
       "(ADVICE r10): a rank-12 hit is invisible to every metric") {
    // 15-deep ranking whose only relevant doc sits at rank 12: with
    // the old when-clause-only cap, mrr_ppm would report 1/12 while
    // p@k saw nothing — and the DuckDB oracle (which truncates at
    // rnk <= 10) would diverge. Now the ranking is truncated to
    // `depth` first, so the hit is invisible everywhere, matching
    // the oracle for ANY caller depth.
    val deep = (1 to 15).map(r =>
        (1L, r, if (r == 12) 10L else r * 100L))
      .toDF("qid", "rnk", "doc_id")
    val qrels = Seq((1L, 10L)).toDF("qid", "doc_id")
    val m = Retrieval.rankEval(deep, qrels).head()
    assert((2 to 7).forall(i => m.getLong(i) == 0L),
      "rank-12 hit must not leak into hits/recall/mrr at depth 10")
    // raising depth to 15 restores it in MRR (1/12) — while the
    // @10-capped hit counts correctly stay 0
    val wide = Retrieval.rankEval(deep, qrels, depth = 15).head()
    assert(wide.getLong(3) == 0L && wide.getLong(7) == 83333L)
  }

  test("ndcg: hand-computed graded DCG/IDCG with frozen discounts") {
    // q1 qrels: doc10 grade 3, doc20 grade 2, doc30 grade 2; ranking
    // hits doc10 at rank 2 and doc30 at rank 7.
    // dcg  = (2³−1)·630929 + (2²−1)·⌊10⁶/log₂8⌋
    //      = 7·630929 + 3·333333                       = 5416502
    // idcg = (2³−1)·10⁶ + (2²−1)·630929 + (2²−1)·5·10⁵ = 10392787
    // ndcg = 5416502·10⁶ // 10392787                   = 521178
    val results = (1 to 10).map(r =>
        (1L, r, if (r == 2) 10L else if (r == 7) 30L else r * 100L))
      .toDF("qid", "rnk", "doc_id")
    val qrels = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 2L))
      .toDF("qid", "doc_id", "grade")
    val m = Retrieval.ndcg(results, qrels).head()
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) ==
           (5416502L, 10392787L, 521178L))
  }

  test("ndcg edge cases: perfect ranking is exactly 10⁶, grades " +
       "saturate at 9, unjudged queries report zeros") {
    // ideal-order ranking → ndcg = 1000000 exactly
    val perfect = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("qid", "rnk", "doc_id")
    val qr = Seq((1L, 10L, 3L), (1L, 20L, 2L)).toDF("qid", "doc_id", "grade")
    assert(Retrieval.ndcg(perfect, qr).head().getLong(3) == 1000000L)
    // grade 50 saturates to gain 2⁹−1 = 511 (keeps dcg·10⁶ < 2⁵³)
    val sat = Retrieval.ndcg(
      Seq((1L, 1, 10L)).toDF("qid", "rnk", "doc_id"),
      Seq((1L, 10L, 50L)).toDF("qid", "doc_id", "grade")).head()
    assert((sat.getLong(1), sat.getLong(3)) == (511L * 1000000L, 1000000L))
    // no qrels at all: zeros, row still reports
    val none = Retrieval.ndcg(perfect,
      Seq.empty[(Long, Long, Long)].toDF("qid", "doc_id", "grade")).head()
    assert((1 to 3).forall(i => none.getLong(i) == 0L))
  }

  test("qrelsGraded: grade is the distinct-term-overlap count and " +
       "the boolean form is its projection") {
    val qs = Seq((1L, "apple banana")).toDF("qid", "query")
    val graded = Retrieval.qrelsGraded(docs, qs, minTerms = 2)
    assert(graded.collect().forall(_.getLong(2) == 2L),
      "two-term query: every surviving doc matched both terms")
    assert(Retrieval.qrelsByTermOverlap(docs, qs, minTerms = 2)
      .collect().map(_.toSeq).toSet ==
      graded.select(col("qid"), col("doc_id")).collect().map(_.toSeq).toSet)
  }

  test("ret_eval composition: bm25 against term-overlap qrels is " +
       "partitioning-invariant and self-consistent") {
    val qs = Seq((1L, "apple banana")).toDF("qid", "query")
    val qr = Retrieval.qrelsByTermOverlap(docs, qs, minTerms = 2)
    // qrels are exactly the docs containing BOTH terms
    val expect = docs.filter(col("text").contains("apple") &&
        col("text").contains("banana"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(qr.collect().map(_.getLong(1)).toSet == expect)
    val a = Retrieval.rankEval(Retrieval.bm25(docs, qs), qr)
      .collect().map(_.toSeq).toSeq
    val b = Retrieval.rankEval(
        Retrieval.bm25(docs.repartition(7), qs),
        Retrieval.qrelsByTermOverlap(docs.repartition(3), qs, minTerms = 2))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("expandTerms: hand-computed PRF weights — query terms out, " +
       "one-doc terms out, ML ppm weights, term-asc tie order") {
    // pool for 'apple' = docs 0,1,3 (pool_len 4+4+1 = 9):
    //   apple tf=4 df=3 -> excluded (query term)
    //   banana tf=2 df=2 -> 2*1e6 div 9 = 222222
    //   fig    tf=2 df=2 -> 222222
    //   cherry tf=1 df=1 -> dropped (pool_df < 2)
    val got = Retrieval.expandTerms(docs, queries).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1, "banana", 2L, 2L, 222222L),
      (1L, 2, "fig", 2L, 2L, 222222L)))
  }

  test("expandTerms: minPoolDf=1 admits single-doc terms; a pool of " +
       "only query terms expands to nothing") {
    val got = Retrieval.expandTerms(docs, queries, minPoolDf = 1)
      .orderBy("rnk").collect().map(r => (r.getString(2), r.getLong(5)))
    assert(got.toSeq == Seq(("banana", 222222L), ("fig", 222222L),
      ("cherry", 111111L)))
    // query 'kiwi': pool = doc 4 only; lime/mango/papaya are each
    // pool_df=1, so the default guard leaves nothing
    val kiwi = Seq((9L, "kiwi")).toDF("qid", "query")
    assert(Retrieval.expandTerms(docs, kiwi).isEmpty)
    // with the guard off the pool LM surfaces, query term still out
    val loose = Retrieval.expandTerms(docs, kiwi, minPoolDf = 1)
      .orderBy("rnk").collect().map(_.getString(2))
    assert(loose.toSeq == Seq("lime", "mango", "papaya"))
  }

  test("qrelsGradedByTf: grade is TOTAL occurrences capped at 9, " +
       "gated on distinct-term overlap") {
    // under 'apple banana': doc 0 = apple×2 + banana×1 ⇒ grade 3,
    // doc 1 = 1+1 ⇒ 2; docs 2 (banana only) and 3 (apple only) fail
    // the 2-distinct-term gate despite matching a term
    val qs = Seq((1L, "apple banana")).toDF("qid", "query")
    val got = Retrieval.qrelsGradedByTf(docs, qs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 3L), (1L, 2L)))
    // the gain cap: 12 total occurrences grade as 9, not 12
    val heavy = docs.unionByName(Seq(
        (9L, ("apple " * 11) + "banana")).toDF("doc_id", "text"))
    val g9 = Retrieval.qrelsGradedByTf(heavy, qs)
      .filter(col("doc_id") === 9L).head().getLong(2)
    assert(g9 == 9L, s"cap at the ndcg gain bound: $g9")
  }

  test("expandedQueries: appends expansion terms in rank order, " +
       "passes a no-expansion query through UNCHANGED") {
    // 'apple' expands to banana, fig (rank order); 'kiwi' expands to
    // nothing under the default pool_df >= 2 guard
    val qs = Seq((1L, "apple"), (9L, "kiwi")).toDF("qid", "query")
    val got = Retrieval.expandedQueries(docs, qs)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "apple banana fig"),
      (9L, "kiwi")),
      s"no trailing separator, no empty token: ${got.toSeq}")
    // re-running bm25 on the rewrite must be well-formed: doc 2 has
    // banana+fig but no apple — expansion makes it retrievable
    val re = Retrieval.bm25(docs, Retrieval.expandedQueries(docs, qs))
    assert(re.filter(col("qid") === 1 && col("doc_id") === 2).count() == 1,
      "expansion must surface the no-query-term doc")
  }

  test("bm25Weighted: uniform 10⁶ weights reproduce plain bm25 " +
       "exactly; halved weight halves the score") {
    val qs = Seq((7L, "apple cherry")).toDF("qid", "query")
    val uni = Seq((7L, "apple", 1000000L), (7L, "cherry", 1000000L))
      .toDF("qid", "term", "weight_ppm")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rnk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(rows(Retrieval.bm25Weighted(docs, uni)) ==
      rows(Retrieval.bm25(docs, qs)),
      "weight 10⁶ ppm is the identity")
    // a single-term query at half weight: every score halves (one
    // term, so the per-doc sum is one product — exact at 4 dp when
    // w_term's 4 dp end in an even last digit or halve cleanly;
    // assert via the recomputed expectation, not a hand constant)
    val half = Seq((1L, "apple", 500000L)).toDF("qid", "term", "weight_ppm")
    val full = Retrieval.bm25(docs, queries).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    val got = Retrieval.bm25Weighted(docs, half).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    for ((d, s) <- got)
      assert(math.abs(s - full(d) / 2.0) < 6e-5,
        s"doc $d: $s vs ${full(d) / 2.0}")
  }

  test("rm3Weights: hand-computed interpolation — original terms at " +
       "λ·P(t|q), expansion terms at (1−λ)·P(t|R), disjoint") {
    // λ = 600000; query 'apple': P(apple|q) = 1/1 → 1e6 ppm,
    // weight = 600000. Expansion banana/fig carry P(t|R) = 222222
    // (the expandTerms fixture) → (1e6−6e5)·222222 div 1e6 = 88888.
    val got = Retrieval.rm3Weights(docs, queries)
      .orderBy("term").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("apple", 600000L), ("banana", 88888L),
      ("fig", 88888L)), s"got ${got.toSeq}")
    // multi-token query with a repeated term: P(t|q) = tf/|q|
    val qs = Seq((2L, "apple apple cherry")).toDF("qid", "query")
    val w = Retrieval.rm3Weights(docs, qs, lambdaPpm = 500000L)
      .filter(col("term").isin("apple", "cherry"))
      .orderBy("term").collect().map(r => (r.getString(1), r.getLong(2)))
    // apple: 5e5·(2·1e6 div 3) div 1e6 = 5e5·666666 div 1e6 = 333333
    // cherry: 5e5·(1e6 div 3) div 1e6 = 166666
    assert(w.toSeq == Seq(("apple", 333333L), ("cherry", 166666L)))
  }

  test("rm3 composition: anchored rewrite scores every doc the " +
       "original query reached (anchor mass can't vanish)") {
    val qs = Seq((1L, "apple")).toDF("qid", "query")
    val anchored = Retrieval.bm25Weighted(docs,
      Retrieval.rm3Weights(docs, qs))
    val origDocs = Retrieval.bm25(docs, qs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rm3Docs = anchored.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(origDocs.subsetOf(rm3Docs ++ origDocs) && origDocs.nonEmpty)
    assert(origDocs.forall(rm3Docs.contains),
      s"anchor terms keep original matches retrievable: $origDocs vs $rm3Docs")
  }
}

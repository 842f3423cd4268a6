package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Text-analysis operators for a training-data pipeline: token stats,
  * quality scoring, language ID, fingerprinting. All built from
  * codegen'd built-in expressions (no UDFs), so they run inside
  * whole-stage codegen and scale linearly with a parquet scan —
  * the 100 TB shape is "one projection, zero shuffles".
  */
object TextAnalysis {

  /** See Dedup.spread — parallelize per-row text work past a
    * single-file scan. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private val stopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it")

  /** Row bound under which the LM weight relation (one fixed-width
    * (long, int, decimal) row per distinct uni/bigram) is broadcast:
    * 16M rows ≈ a few hundred MB hashed — comfortably inside an
    * executor, far under the 8 GB broadcast ceiling. Past it the join
    * falls back to AQE's choice (shuffle join on the hash key). */
  private val MaxBroadcastWeightRows = 16L * 1000 * 1000

  /** Token statistics per document: token count, char count, average
    * token length (rounded; integer sums so exact everywhere). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val documents = spread(docs)
    val toks = tokens(col("text"))
    documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      length(col("text")).as("n_chars_text"),
      round(
        aggregate(transform(toks, t => length(t)), lit(0L), (a, v) => a + v)
          .cast("double") / size(toks), 4).as("avg_token_len"),
      // BPE-ish subword count: letter runs, digit runs, other symbols
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_subtokens"))
  }

  /** Quality heuristics: stopword ratio, distinct-token ratio (a
    * repetition detector), max single-token share. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val documents = spread(docs)
    val toks = tokens(col("text"))
    val nStop = size(filter(toks, t => t.isin(stopwordsEn: _*)))
    documents.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      nStop.as("n_stopwords"),
      round(nStop.cast("double") / size(toks), 4).as("stop_ratio"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("distinct_ratio"),
      size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
        .as("n_punct"),
      round(size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
        .cast("double") / length(col("text")), 4).as("punct_ratio"))
  }

  /** End-to-end corpus-cleaning composite — the shape of a real
    * training-data preparation job: quality gate (length + lexical
    * diversity) → exact dedup keeping the canonical min-id doc →
    * per-source corpus stats. One scan, one window shuffle on the
    * text hash, one aggregation. */
  def cleanCorpusStats(docs: DataFrame, minTokens: Int = 20,
                       minDistinctRatio: Double = 0.5): DataFrame = {
    val documents = spread(docs)
    val toks = tokens(col("text"))
    val gated = documents
      .withColumn("n_tokens", size(toks))
      .withColumn("distinct_ratio",
        round(size(array_distinct(toks)).cast("double") / size(toks), 4))
      .filter(col("n_tokens") >= minTokens &&
        col("distinct_ratio") >= minDistinctRatio)
    val w = Window.partitionBy(md5(col("text")))
    gated
      .withColumn("canonical", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("canonical"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_tokens").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_tokens"))
  }

  /** N-gram-heuristic language ID: score marker-token hits per language
    * family, predict the argmax (deterministic tiebreak by language
    * code order en < es < de < fr). */
  def languageId(docs: DataFrame): DataFrame = {
    val documents = spread(docs)
    val toks = tokens(col("text"))
    def score(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers: _*)))
    val sEn = score(Seq("the", "and", "of", "is"))
    val sEs = score(Seq("el", "la", "de", "que"))
    val sDe = score(Seq("der", "die", "und", "das"))
    val sFr = score(Seq("le", "la", "et", "les"))
    documents.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"),
      when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
        .when(sEs >= sDe && sEs >= sFr, "es")
        .when(sDe >= sFr, "de")
        .otherwise("fr").as("pred_lang"))
  }

  /** Winnowing fingerprint (rolling k-gram hashes + window minima,
    * the MOSS scheme — see functions.WinnowSelect): per doc, the
    * selected-hash count and a digest of the sorted selection. Two
    * docs sharing text regions share selected hashes, so the
    * selection set drives containment/overlap detection at scale. */
  def winnowFingerprint(docs: DataFrame): DataFrame =
    spread(docs)
      .select(col("doc_id"),
        call_function("graft_winnow", col("text")).as("sel"))
      .filter(col("sel").isNotNull)
      .select(col("doc_id"),
        size(col("sel")).as("n_selected"),
        substring(md5(concat_ws("", col("sel"))), 1, 16).as("winnow_fp"))

  /** Document fingerprint: md5-based 64-bit-equivalent hash of the
    * whitespace-normalized lowercase text (SURVEY — rolling-hash
    * fingerprinting done portably). */
  def fingerprint(docs: DataFrame): DataFrame =
    spread(docs).select(
      col("doc_id"),
      hex16(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"),
      length(col("text")).as("n_chars_text"))

  /** Repetition statistics — the Gopher-style quality signal that
    * catches degenerate/boilerplate documents: the share of a doc's
    * word bigrams taken by its single most frequent bigram, plus the
    * distinct-bigram ratio. Documents shorter than two tokens have no
    * bigrams and drop out (mirrored by the oracle).
    *
    * Two keyed aggregations on doc_id, both map-side combinable. A
    * zero-shuffle variant (sort bigrams in-row, take run lengths of
    * the sorted array as counts) was A/B'd in round 6 and LOST —
    * 3.99 s vs 0.73 s at sf0.1, 5.4 s vs 2.4 s at sf1: Spark's
    * higher-order array functions evaluate interpreted per element,
    * while the bigram shuffle collapses map-side and stays inside
    * codegen. Keep the declarative aggregation. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val documents = spread(docs)
    val counts = documents
      .select(col("doc_id"), explode(shingles(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max(col("c")).as("top_n"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct_grams"),
        round(col("top_n").cast("double") / col("n_grams"), 4)
          .as("top_gram_frac"),
        round(col("n_distinct_grams").cast("double") / col("n_grams"), 4)
          .as("distinct_gram_ratio"))
  }

  /** PII scrubbing: count and mask email / IPv4 / phone-shaped spans
    * (the redaction pass every corpus pipeline runs before training).
    * Pure regexp projection — scan speed, zero shuffles; patterns kept
    * to the Java∩RE2 regex subset so any engine applies the identical
    * transformation. Emits match counts plus a digest of the scrubbed
    * text (compact, still value-checks the full rewrite). Semantics on
    * PII-bearing text are spec-tested (the synthetic corpus contains
    * none, which the oracle also confirms cross-engine). */
  /** Corpus composition report — the mixture table a training run's
    * data card states: per (lang, source) cell, document and token
    * totals plus the cell's share of all corpus tokens. Two
    * map-side-combinable aggregates and a 1-row broadcast; the share
    * is the only division and rounds at 6dp, so the report is
    * engine-exact. */
  def corpusMix(docs: DataFrame): DataFrame = {
    val base = spread(docs).select(col("lang"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_tok"))
    val total = base.agg(sum(col("n_tok")).as("total_tok"))
    base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tok"), 6)
          .as("tok_share"))
  }

  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** The PII rewrite as a column, reusable by batch and streaming
    * callers ([[piiScrub]], `streaming.CorpusIngest`). */
  /** Markup → text: the front step of every web-crawl corpus
    * pipeline (CCNet/RefinedWeb start from HTML). Declarative and
    * engine-portable: script/style blocks drop WITH their contents
    * (inline (?is) flags — dot-matches-newline, case-insensitive;
    * both Java regex and RE2 accept them), remaining tags become
    * spaces, the five standard entities unescape, whitespace
    * collapses, ends trim. Runs inside codegen like every other
    * kernel here; boilerplate REMOVAL beyond markup (nav/footer
    * text) is [[graft.dedup.Dedup.removeDupSpans]]'s job — that is a
    * corpus-level signal, not a per-document regex. */
  def stripMarkup(html: Column): Column = {
    // two explicit patterns, not one with a backreference: the oracle
    // engine's RE2 has no \1, and lockstep patterns keep both engines
    // computing the identical function
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val unescaped =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&amp;", "&") // LAST, so "&amp;lt;" ends as "&lt;" not "<"
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiIpv4, "<IP>"),
      PiiPhone, "<PHONE>")

  /** Total PII-shaped spans in `text` (email + IPv4 + phone). */
  def piiSpanCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PiiEmail), lit(0))) +
      size(regexp_extract_all(text, lit(PiiIpv4), lit(0))) +
      size(regexp_extract_all(text, lit(PiiPhone), lit(0)))

  def piiScrub(docs: DataFrame): DataFrame = {
    val email = PiiEmail
    val ipv4 = PiiIpv4
    val phone = PiiPhone
    val scrubbed = scrubPii(col("text"))
    spread(docs).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(ipv4), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(phone), lit(0))).as("n_phones"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Token-budget packing: assign documents to training shards of
    * ~`budgetTokens` tokens each, per source. Documents line up in
    * hash order (deterministic, uniform), the running token total
    * fills bins greedily, and a document's bin is the budget-quotient
    * of the tokens BEFORE it — so every bin except the last holds at
    * least `budgetTokens` and re-runs agree row-for-row. One window
    * cumsum per source = one hash-partition shuffle; at 100 TB the
    * per-source sort is the scalable equivalent of the inherently
    * sequential greedy packer. */
  def packBins(docs: DataFrame, budgetTokens: Int = 512): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col("source"))
      .orderBy(hash52(col("doc_id")), col("doc_id"))
    spread(docs)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        expr(s"(cum_tokens - n_tokens) div $budgetTokens"))
  }

  /** Distinctive terms per language by TF-IDF, with a RATIONAL idf
    * `(n_docs+1)/(df+1)` in place of its logarithm: `log` is not
    * correctly rounded and differs across libm implementations, while
    * the rational form is exact int→double conversions plus one
    * correctly-rounded IEEE division — strictly decreasing in df just
    * like log-idf, so the RANKING is identical and the value
    * hash-matches any engine (the same reasoning as weightedTopK's
    * priority). Plan shape: one token explode feeding two keyed
    * aggregations (term frequency per (lang, term); document frequency
    * per term over the deduped (doc, term) pairs), a term-keyed
    * shuffle join between them, the corpus doc count as a 1-row
    * broadcast (the scalar-subquery idiom), and per-lang top-k as a
    * rank-filter window that InferWindowGroupLimit prunes before the
    * full sort. Nothing is driver-side: df lives in a vocabulary-sized
    * aggregate, never a collected map, so the shape holds at 100 TB. */
  def tfidfTerms(docs: DataFrame, topK: Int = 10, minDf: Int = 2): DataFrame = {
    require(topK > 0 && minDf >= 1, s"need topK > 0, minDf >= 1")
    val tok = spread(docs).select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(
        col("tf").cast("double") *
          ((col("n_docs") + 1).cast("double") /
            (col("df") + 1).cast("double")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("lang"), col("rnk"), col("term"),
        col("tf"), col("df"), col("score"))
  }

  /** Bigram collocations by LIFT — the observed bigram probability
    * over the product of its words' unigram probabilities. This is
    * PMI without the log (log is not correctly rounded across libm
    * implementations; lift is exact conversions, correctly-rounded
    * products and one division, so it is bit-identical in any engine —
    * and log's monotonicity means the ranking equals log-PMI's). The
    * min-count gate drops the hapax-bigram tail BEFORE the unigram
    * joins, so join input is the interesting head, not the raw bigram
    * table. Plan: two explodes → two keyed counts, two term-keyed
    * shuffle joins (vocabulary-sized sides), corpus totals as 1-row
    * broadcasts, and the global top-k as TakeOrderedAndProject (no
    * full result sort). */
  def collocations(docs: DataFrame, minCount: Int = 5,
                   topK: Int = 20): DataFrame = {
    require(minCount >= 1 && topK > 0, "need minCount >= 1, topK > 0")
    val documents = spread(docs)
    val uni = documents.select(explode(tokens(col("text"))).as("term"))
    val uniCounts = uni.groupBy(col("term")).agg(count(lit(1)).as("n_term"))
    val nUni = uni.agg(count(lit(1)).as("n_uni"))
    val bi = documents.select(explode(shingles(col("text"), 2)).as("bigram"))
    val biCounts = bi.groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val nBi = bi.agg(count(lit(1)).as("n_bi"))
    biCounts
      // tokens are split on single spaces, so the bigram's separator
      // space is unambiguous — the halves recover the exact words
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uniCounts.select(col("term").as("w1"), col("n_term").as("n_a")),
        "w1")
      .join(uniCounts.select(col("term").as("w2"), col("n_term").as("n_b")),
        "w2")
      .crossJoin(broadcast(nUni))
      .crossJoin(broadcast(nBi))
      .withColumn("lift", round(
        col("n_ab").cast("double") * col("n_uni").cast("double") *
          col("n_uni").cast("double") /
          (col("n_bi").cast("double") * col("n_a").cast("double") *
            col("n_b").cast("double")), 4))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(topK)
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"), col("lift"))
  }

  /** Fixed-size token chunking with overlap — the step that turns
    * documents into training sequences. Chunk `i` covers tokens
    * `[i·step, i·step + chunkTokens)` with `step = chunkTokens −
    * overlap`; the tail chunk may run short, and a document shorter
    * than one chunk still yields exactly one. Emits a digest rather
    * than the chunk text so results stay compact; the generation is
    * pure per-row compute (sequence + posexplode — no shuffle, no
    * state), so at 100 TB it runs at scan speed and the output
    * partitioning inherits the input's. */
  def chunk(docs: DataFrame, chunkTokens: Int = 64,
            overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val step = chunkTokens - overlap
    val nChunks = greatest(lit(1),
      expr(s"(size(t) - $overlap + $step - 1) div $step"))
    val chunkToks =
      slice(col("t"), col("chunk_idx") * step + 1, lit(chunkTokens))
    spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0L), nChunks - 1)))
      .withColumnRenamed("col", "chunk_idx")
      .select(
        col("doc_id"),
        col("chunk_idx"),
        size(chunkToks).as("n_chunk_tokens"),
        md5(concat_ws(" ", chunkToks)).as("chunk_md5"))
  }

  /** Language-model quality proxy without a language model: the
    * fraction of a document's bigrams that fall inside the corpus's
    * top-`vocabSize` bigram vocabulary (an in-vocabulary / n-gram
    * coverage rate — the libm-free stand-in for the "perplexity of a
    * small LM" filter in public pipeline descriptions like CCNet and
    * Gopher's quality rules; gibberish and boilerplate both score
    * low). Documents shorter than 2 tokens have no bigrams and are
    * absent from the output, same as the oracle.
    *
    * Scale shape: bigram counting is one map-side-combinable groupBy;
    * the vocabulary is `orderBy(count desc).limit(V)` — planned as
    * TakeOrderedAndProject, so no global sort materializes — and is
    * tiny by construction, so scoring is one BROADCAST join against
    * the exploded bigrams followed by a per-doc aggregate. Tie at the
    * vocabulary boundary breaks deterministically by bigram string. */
  /** Per-document ADMISSION GATE — the cleaning decision composed
    * from two session signals: substring-level duplication
    * ([[graft.dedup.Dedup.dupRate]] — boilerplate and cross-doc
    * copies) and n-gram vocabulary coverage ([[lmCoverageScore]] —
    * gibberish and vocabulary-foreign text). A doc keeps only when
    * BOTH gates pass; `reason` names the FIRST failed gate so a
    * rejected corpus can be triaged by cause. Docs too short to have
    * bigrams score iv_rate 0 and fail the quality gate — short
    * fragments are exactly what the filter should drop.
    *
    * One row per input document, always — a gate that silently drops
    * rows can't be audited. Plan: the two signal pipelines join on
    * doc_id; each is the shipped query's plan unchanged. */
  def admissionGate(docs: DataFrame, maxDupFrac: Double = 0.5,
                    minIvRate: Double = 0.15,
                    vocabSize: Int = 200): DataFrame = {
    // ONE corpus scan: tokenize once, materialize (the SetSimJoin
    // localCheckpoint idiom), and derive BOTH signals from the shared
    // (doc_id, t) relation. Round 5 composed the two shipped queries
    // verbatim, which re-parsed the corpus per signal branch (6 scans
    // through Catalyst's no-CSE-across-joins planning) — the suite's
    // heaviest non-setsim row at sf1. On a cluster the checkpoint
    // becomes a persisted/shuffle-reused relation; the shape (parse
    // once, derive n-gram grains per signal) is the 100 TB posture.
    val tok = spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .localCheckpoint()
    val dup = graft.dedup.Dedup.dupRateOfTokens(tok)
      .select(col("doc_id"), col("n_tokens"), col("dup_frac"))
    val cov = lmCoverageOfTokens(tok, vocabSize)
      .select(col("doc_id"), col("iv_rate"))
    dup.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_frac"),
        coalesce(col("iv_rate"), lit(0.0)).as("iv_rate"))
      .withColumn("keep",
        col("dup_frac") <= maxDupFrac && col("iv_rate") >= minIvRate)
      .withColumn("reason",
        when(col("dup_frac") > maxDupFrac, lit("duplication"))
          .when(col("iv_rate") < minIvRate, lit("low_quality")))
  }

  /** The admission gate graduated to the CCNet-shaped filter: keep =
    * low duplication AND low smoothed-bigram-LM negative
    * log-likelihood ([[lmScore]]'s avg_nll — the perplexity-style
    * signal; [[admissionGate]]'s iv_rate is its 0/1-vocabulary
    * special case). Same single-scan contract: one materialized
    * (doc_id, t) relation feeds the span miner and the LM, and the
    * output keeps one row per input document with the FIRST failed
    * gate named. Docs too short for bigrams have no LM evidence and
    * fail as `high_perplexity` — fragments are what the filter should
    * drop. */
  def admissionGateLm(docs: DataFrame, maxDupFrac: Double = 0.5,
                      maxAvgNll: Double = 8.0,
                      k: Double = 1.0): DataFrame = {
    val tok = spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .localCheckpoint()
    val dup = graft.dedup.Dedup.dupRateOfTokens(tok)
      .select(col("doc_id"), col("n_tokens"), col("dup_frac"))
    val lm = lmScoreOfTokens(tok, k)
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))
    dup.join(lm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_frac"),
        col("n_bigrams"), col("avg_nll"))
      .withColumn("keep",
        col("dup_frac") <= maxDupFrac &&
          col("avg_nll").isNotNull && col("avg_nll") <= maxAvgNll)
      .withColumn("reason",
        when(col("dup_frac") > maxDupFrac, lit("duplication"))
          .when(col("avg_nll").isNull || col("avg_nll") > maxAvgNll,
            lit("high_perplexity")))
  }

  /** Smoothed bigram-LM negative log-likelihood per document — the
    * perplexity-style quality filter of CCNet (Wenzek et al.,
    * "CCNet: Extracting high quality monolingual datasets from web
    * crawl data", LREC 2020), with the corpus itself as the training
    * text and add-k smoothing standing in for a pretrained KenLM:
    * score(doc) = −(1/n) Σ ln((c₂(w₁w₂)+k)/(c₁(w₁)+k·V)). High
    * avg_nll = text whose word transitions the corpus has never seen
    * — gibberish, boilerplate soup, vocabulary-foreign content;
    * [[lmCoverageScore]]'s iv_rate is the 0/1-vocabulary special
    * case of this.
    *
    * Scale shape: bigram and unigram counts are map-side-combinable
    * groupBys; the two count joins shuffle on the n-gram key (df-like
    * distributions, AQE-splittable); V rides a 1-row broadcast. Each
    * term's ln() rounds at 6dp and accumulates in DECIMAL so the
    * per-doc sum is summation-order independent and engine-portable
    * (the Portable.exactSum convention — doubles differ across
    * engines only far past 6dp). */
  def lmScore(docs: DataFrame, k: Double = 1.0): DataFrame =
    // tok is NOT checkpointed here: the tagged-relation kernel fuses
    // parse+hash into one pass and materializes only its (tag, hash)
    // output; the per-doc spine reads doc_id straight off the source
    // (column-pruned scan), so nothing re-parses text
    lmScoreImpl(
      spread(docs).select(col("doc_id"), tokens(col("text")).as("t")),
      docs.select(col("doc_id")), k)

  /** [[lmScore]] over a pre-tokenized `(doc_id, t)` relation (the
    * admission gates' shared-scan contract; callers checkpoint tok). */
  def lmScoreOfTokens(tok: DataFrame, k: Double = 1.0): DataFrame =
    lmScoreImpl(tok, tok.select(col("doc_id")), k)

  // tagged n-gram instance rows, ONE kernel pass over the corpus:
  //   tag 1 = bigram instance, tag 2 = unigram instance,
  //   tag 3 = the per-doc last-token correction row.
  // Grams are hashed NUMERICALLY (xxhash64 over the token columns,
  // seeded by grain) — no per-bigram string concatenation, and every
  // downstream exchange carries (long, int, long) fixed-width rows.
  // The hash never reaches the output; a 64-bit collision merges one
  // gram pair's counts in ~2^32 distinct grams — far past any
  // realistic vocabulary before it shifts a smoothed-LM score.
  private def lmTagged(tok: DataFrame): DataFrame = {
    val n = size(col("t"))
    val bh = zip_with(slice(col("t"), lit(1), n - 1),
      slice(col("t"), lit(2), n - 1),
      (a, b) => xxhash64(lit("lm:b"), a, b))
    val uh = transform(col("t"), w => xxhash64(lit("lm:u"), w))
    val lh = xxhash64(lit("lm:u"), element_at(col("t"), -1))
    tok.filter(size(col("t")) > 0)
      .select(col("doc_id"),
        explode(concat(
          transform(bh, h => struct(lit(1).as("tag"), h.as("h"))),
          transform(uh, h => struct(lit(2).as("tag"), h.as("h"))),
          array(struct(lit(3).as("tag"), lh.as("h"))))).as("x"))
      .select(col("doc_id"), col("x.tag").as("tag"), col("x.h").as("h"))
  }

  /** The scorer behind [[lmScore]]/[[lmScoreOfTokens]], restructured
    * for scale around the per-instance decomposition
    *   ll = ln(c2(g)+k) − ln(c1(w1)+k·V):
    * the per-doc sum of the second term over bigram instances equals
    * the sum over ALL token instances minus the doc's LAST token, so
    * one tagged relation ([[lmTagged]], one kernel pass, one
    * materialization) feeds a single (tag, hash) count aggregate —
    * producing BOTH count relations and |V| — and a single
    * broadcast-joined probe pass. Corpus passes drop from five
    * (tok ckpt, bigram ckpt, unigram agg, bigram agg, probe) to
    * three, with no string shingles anywhere. Each log term rounds
    * at 6dp and accumulates in DECIMAL (the Portable.exactSum
    * convention), so the score stays summation-order independent and
    * engine-portable; the oracle computes the identical
    * decomposition. */
  private def lmScoreImpl(tok: DataFrame, spine: DataFrame,
                          k: Double): DataFrame = {
    val tagged = lmTagged(tok).localCheckpoint()
    // vocab-sized; materialized because it feeds the |V| count AND
    // the weight build (Catalyst shares no subtrees across join
    // sides — unmaterialized, the corpus aggregate would run twice)
    val counts = tagged.filter(col("tag") < 3)
      .groupBy(col("tag"), col("h")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val v = counts.filter(col("tag") === 2).agg(count(lit(1)).as("v"))
    val weights = counts.crossJoin(broadcast(v))
      .select(col("tag").as("jtag"), col("h"),
        when(col("tag") === 1, round(log(col("c") + lit(k)), 6))
          .otherwise(round(log(col("c") + lit(k) * col("v")), 6))
          .cast("decimal(18,6)").as("w"))
    // The weight relation is CORPUS-vocab-sized (distinct uni+bigrams),
    // not frozen-LM-sized — it grows with the corpus, so a forced
    // broadcast would eventually exceed the driver/8 GB broadcast
    // ceiling at the 100 TB posture. Guard the hint with an explicit
    // row bound (counts is already materialized, so the count is a
    // cheap checkpoint scan): under the bound, broadcast — the
    // measured fast path at bench scale; over it, leave the join to
    // AQE, which sees exact sizes on the checkpointed side.
    val weightsSide =
      if (counts.count() <= MaxBroadcastWeightRows) broadcast(weights)
      else weights
    val perDoc = tagged
      .withColumn("jtag",
        when(col("tag") === 3, lit(2)).otherwise(col("tag")))
      .join(weightsSide, Seq("jtag", "h"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("tag") === 1, 1L).otherwise(0L)).as("n_bigrams"),
        sum(when(col("tag") === 2, -col("w")).otherwise(col("w")))
          .as("sum_ll"))
      // single-token docs carry no bigram evidence: drop them here so
      // the spine's left join nulls avg_nll exactly like absent docs
      .filter(col("n_bigrams") > 0)
    spine.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(-col("sum_ll").cast("double") / col("n_bigrams"), 4)
          .as("avg_nll"))
  }

  /** A FROZEN add-k bigram LM: corpus-trained counts plus vocabulary
    * size, for scoring text the model has never seen — the actual
    * CCNet deployment shape (train the LM offline, apply it at
    * ingest). [[lmScore]] is the self-scored special case where the
    * corpus grades itself. `bigrams`/`unigrams` are count relations
    * (vocabulary-sized); `v` is collected once at TRAIN time — a
    * single driver scalar, the same budget as collecting k centroids. */
  final case class LmModel(bigrams: DataFrame, unigrams: DataFrame,
                           v: Long, k: Double)

  /** Train the frozen LM once. One corpus parse (the token relation
    * is materialized and feeds both aggregates), and the count
    * relations are materialized too — FROZEN means scoring never
    * re-runs the training scan, and |V| comes from the unigram
    * aggregate rather than a second corpus pass. */
  def trainLm(docs: DataFrame, k: Double = 1.0): LmModel = {
    val tok = spread(docs).select(tokens(col("text")).as("t"))
      .localCheckpoint()
    val c2 = tok.select(explode(shinglesOfTokens(col("t"), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val c1 = tok.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val v = c1.count()
    LmModel(c2, c1, v, k)
  }

  /** Score a batch — including a stream's micro-batch inside
    * foreachBatch — against a frozen [[LmModel]]. Bigrams/words the
    * model never saw take count 0 and fall to the smoothing floor
    * ln(k/(k·V)), which is what makes the frozen shape well-defined
    * on unseen text. The model rides broadcast joins (vocabulary is
    * corpus-vocab-sized; for a huge vocab drop the hint and let AQE
    * pick a shuffle join); same 6dp-DECIMAL accumulation as
    * [[lmScore]], so re-scoring is engine- and order-independent. */
  def scoreWithLm(batch: DataFrame, model: LmModel): DataFrame = {
    val bg = batch
      .select(col("doc_id"),
        explode(shinglesOfTokens(tokens(col("text")), 2)).as("g"))
      .withColumn("w1", split(col("g"), " ").getItem(0))
    val perDoc = bg
      .join(broadcast(model.bigrams), Seq("g"), "left")
      .join(broadcast(model.unigrams), col("w1") === col("w"), "left")
      .withColumn("ll",
        round(log((coalesce(col("c2"), lit(0L)) + lit(model.k)) /
          (coalesce(col("c1"), lit(0L)) + lit(model.k) * lit(model.v))), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ll")).as("sum_ll"))
    batch.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(-col("sum_ll").cast("double") / col("n_bigrams"), 4)
          .as("avg_nll"))
  }

  def lmCoverageScore(docs: DataFrame, vocabSize: Int = 1000): DataFrame =
    lmCoverageOfTokens(
      spread(docs).select(col("doc_id"), tokens(col("text")).as("t")),
      vocabSize)

  /** [[lmCoverageScore]] over a pre-tokenized `(doc_id, t)` relation
    * (the admission gates' shared-scan contract). */
  def lmCoverageOfTokens(tok: DataFrame, vocabSize: Int = 1000): DataFrame = {
    // the bigram relation feeds BOTH the vocabulary aggregate and the
    // scoring join's probe side; Catalyst shares no subexpressions
    // across join sides, so without materialization the tokenize+
    // explode pass runs twice (the admission-gate lesson, round 6)
    val bg = tok
      .select(col("doc_id"),
        explode(shinglesOfTokens(col("t"), 2)).as("g"))
      .localCheckpoint()
    val vocab = bg
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g"))
      .limit(vocabSize)
      .select(col("g"), lit(1L).as("hit"))
    bg.join(broadcast(vocab), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        coalesce(sum(col("hit")), lit(0L)).as("n_in_vocab"))
      .select(col("doc_id"), col("n_bigrams"), col("n_in_vocab"),
        round(col("n_in_vocab").cast("double") / col("n_bigrams"), 4)
          .as("iv_rate"))
  }
}

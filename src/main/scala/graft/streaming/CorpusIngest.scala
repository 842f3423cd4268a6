package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable.tokens
import graft.text.TextAnalysis

/** Streaming corpus admission — the ingest-time composition of the
  * batch cleaning family: quality gate + PII redaction + near-dup
  * suppression in ONE streaming pass. This is the front door of a
  * training-data pipeline: documents arrive on a stream, and what
  * lands in the corpus store is already masked, quality-gated and
  * deduplicated, so no batch re-clean has to chase the ingest.
  *
  * Composition order matters and is deliberate:
  *  1. PII masking FIRST — rejected docs are still logged with their
  *     reason, and nothing downstream (including reject sinks) may
  *     ever see raw PII.
  *  2. Quality gates as stateless projections — token count and
  *     lexical diversity ride the scan exactly like the batch
  *     [[graft.text.TextAnalysis.qualityScore]], zero state.
  *  3. Near-dup suppression LAST, only over admitted docs — the
  *     watermark-bounded signature dedup of
  *     [[StreamingDedup.uniqueBySignature]]; suppressing before the
  *     gate would spend dedup state on docs the gate drops anyway.
  *
  * Scale: steps 1-2 are per-row projections (no shuffle, no state);
  * step 3's state is one row per distinct signature inside the
  * watermark, the same bound as the underlying
  * `dropDuplicatesWithinWatermark`. The stream stays a stream — no
  * collect, no batch join against itself.
  */
object CorpusIngest {

  /** Per-doc annotation: scrubbed text + gate verdict. Stateless, so
    * it works identically on a stream or a batch frame (the spec
    * cross-checks the two). Input needs (doc_id, ts, text). */
  def annotate(docs: DataFrame, minTokens: Int = 5,
               minDistinctRatio: Double = 0.3): DataFrame = {
    val masked = TextAnalysis.scrubPii(col("text"))
    val toks: Column = tokens(masked)
    docs
      .select(col("doc_id"), col("ts"),
        masked.as("text"),
        TextAnalysis.piiSpanCount(col("text")).as("n_pii"),
        size(tokens(masked)).as("n_tokens"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("distinct_ratio"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, lit("too_short"))
          .when(col("distinct_ratio") < minDistinctRatio,
            lit("low_diversity")))
      .withColumn("keep", col("reason").isNull)
  }

  /** Attach per-micro-batch admission metrics to an [[annotate]]d
    * frame via `Dataset.observe` — the zero-extra-pass ops surface:
    * metrics ride the existing scan (no second aggregation, no
    * foreachBatch counting) and surface in every
    * `StreamingQueryProgress.observedMetrics("corpus_gate")` row (and
    * in `QueryExecutionListener` for batch). Emits n_in / n_kept /
    * n_pii — what an ingest dashboard alerts on. */
  def withGateMetrics(annotated: DataFrame): DataFrame =
    annotated.observe("corpus_gate",
      count(lit(1)).as("n_in"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(col("n_pii").cast("long")).as("n_pii"))

  /** The LIVE leakage monitor (r12 verdict item 8): per-micro-batch
    * χ²·ppm of a (feature, label) association — e.g. (source, label)
    * or (shard, label) — riding the stream as an OBSERVED metric
    * next to [[withGateMetrics]]'s counters, so distribution drift
    * is visible at admission time instead of the next batch audit.
    * The aggregate is `Expectations.chi2Ppm`, whose state is the
    * contingency-cell map (vocabulary²-sized, never row-sized) and
    * whose result equals the batch audit's `sum(contrib_ppm)`
    * bit for bit — same full marginal cross product, zero-observed
    * cells included, same floors (spec-pinned both against the
    * relational epilogue and through a running stream). `n_assoc`
    * rides along so a spiky χ² on a tiny batch reads as what it is.
    * Composable with other observes: Spark allows any number of
    * distinctly-named observe nodes on one stream. */
  def withLeakageMetrics(df: DataFrame, feature: Column,
                         label: Column): DataFrame =
    df.observe("leakage_gate",
      graft.operators.Expectations.chi2Ppm(feature, label)
        .as("chi2_ppm"),
      count(lit(1)).as("n_assoc"))

  /** The admitted stream: annotated, gate-passing, near-dup-suppressed
    * (first arrival of each signature class wins within the
    * watermark). Append mode; attach the corpus-store sink here. */
  def ingest(docs: DataFrame, minTokens: Int = 5,
             minDistinctRatio: Double = 0.3,
             lateness: String = "10 seconds"): DataFrame =
    StreamingDedup.uniqueBySignature(
      annotate(docs, minTokens, minDistinctRatio)
        .filter(col("keep"))
        .drop("keep", "reason"),
      lateness)

  /** Ingest-time perplexity gate — the CCNet-graduated quality filter
    * applied at the front door: score a micro-batch against a FROZEN
    * corpus-trained LM ([[graft.text.TextAnalysis.trainLm]], built
    * offline) and keep documents at or under `maxAvgNll`. Per-doc
    * scoring aggregates over exploded bigrams, so this runs inside
    * `foreachBatch` (batch semantics per micro-batch — the standard
    * pattern for model-apply sinks), downstream of [[ingest]]'s
    * stateless gates. One row per input doc; docs too short for
    * bigrams have no LM evidence and fail as `high_perplexity`. */
  def lmGate(batch: DataFrame, model: TextAnalysis.LmModel,
             maxAvgNll: Double): DataFrame =
    batch.join(
        TextAnalysis.scoreWithLm(batch, model)
          .select(col("doc_id"), col("n_bigrams"), col("avg_nll")),
        Seq("doc_id"), "left")
      .withColumn("keep",
        col("avg_nll").isNotNull && col("avg_nll") <= maxAvgNll)
      .withColumn("reason",
        when(!col("keep"), lit("high_perplexity")))

  /** The full front door as ONE running query: document stream →
    * [[ingest]] (PII mask → stateless gates → watermarked signature
    * dedup) → frozen-LM perplexity gate → `store`. The LM scoring
    * aggregates over exploded bigrams, so the gate runs inside
    * foreachBatch (batch semantics per micro-batch) and `store`
    * receives the gated frame — one row per admitted-so-far doc with
    * `keep`/`reason`/`avg_nll` evidence, so the sink can route keeps
    * and LM-rejects without re-scoring. Pass `checkpointDir` for
    * exactly-once restartable ingest.
    *
    * Scale: everything before the signature dedup is a stateless
    * projection; dedup state is watermark-bounded; the LM rides
    * broadcast joins ([[graft.text.TextAnalysis.scoreWithLm]]) sized
    * by the frozen vocabulary, not the stream. */
  def ingestWithLm(docs: DataFrame, model: TextAnalysis.LmModel,
                   maxAvgNll: Double,
                   store: (DataFrame, Long) => Unit,
                   minTokens: Int = 5, minDistinctRatio: Double = 0.3,
                   lateness: String = "10 seconds",
                   checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var w = ingest(docs, minTokens, minDistinctRatio, lateness)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        store(lmGate(batch, model, maxAvgNll), epoch)
        ()
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }

  /** The routed streaming verification front door as product code —
    * the composition [[StreamingDedup.candidatePairs]] →
    * [[graft.dedup.Dedup.verifyPairs]]: LSH candidate pairs mined
    * in-flight (per-bucket state = one spine id, watermark-expired),
    * each micro-batch's collisions verified EXACTLY against the
    * document store before any doc is blamed as a near-dup.
    * `store()` is called once per micro-batch and supplies the
    * current (doc_id, text) corpus — a parquet read, a memory table,
    * whatever the ingest maintains. `onVerified` receives the pairs
    * meeting the threshold with exact evidence (n1, n2, inter,
    * jaccard).
    *
    * Scale: candidate volume is arrivals × colliding bands, never
    * corpus²; [[graft.dedup.Dedup.verifyPairs]] tokenizes ONLY docs
    * appearing in some pair (left-semi pruned), so verification cost
    * tracks duplicates, not the store. */
  def verifiedIngest(docs: DataFrame, store: () => DataFrame,
                     onVerified: (DataFrame, Long) => Unit,
                     lateness: String = "10 seconds",
                     stateTtlMs: Long = 60000L,
                     tNum: Long = 1L, tDen: Long = 2L,
                     checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var w = StreamingDedup.candidatePairs(docs, lateness, stateTtlMs)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        onVerified(
          graft.dedup.Dedup.verifyPairs(batch, store(), tNum, tDen), epoch)
        ()
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }

  /** The reject stream for triage: gate failures with their reason,
    * PII already masked. Run as a SECOND query over the same source —
    * both queries are stateless up to the split, so the fan-out costs
    * one extra source read, not a stateful fork. */
  def rejects(docs: DataFrame, minTokens: Int = 5,
              minDistinctRatio: Double = 0.3): DataFrame =
    annotate(docs, minTokens, minDistinctRatio)
      .filter(!col("keep"))
      .drop("keep")
}

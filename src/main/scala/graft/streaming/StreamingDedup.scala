package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup
import graft.functions.Portable.tokens

/** Streaming near-duplicate handling for a document stream — the
  * ingest-time half of the batch `graft.dedup` pipeline. Both ops run
  * the SAME signature kernel as batch (`graft_minhash`, compiled
  * per-row, no shuffle before the keyed stage), so a corpus deduped
  * in-flight agrees with a batch re-dedup of the same data.
  *
  *  - [[uniqueBySignature]]: emit only the first document of each
  *    minhash-signature equivalence class (signature-identical ≈
  *    Jaccard ≈ 1 near-dups). Built on
  *    `dropDuplicatesWithinWatermark`, so state is bounded by the
  *    watermark, not the corpus.
  *  - [[candidatePairs]]: emit (spine, doc) candidate pairs per LSH
  *    band bucket as documents arrive — the streaming form of the
  *    batch bucket expansion, for a downstream exact verifier. One
  *    `flatMapGroupsWithState` keyed by (band, key); per-bucket state
  *    is just the spine doc id, expired by event-time timeout once
  *    the watermark passes the bucket's last activity + `stateTtlMs`.
  *
  * Scale: state per active bucket = one long; the bucket key stage is
  * the only shuffle; candidate-pair volume is bounded by arrivals ×
  * colliding bands, never corpus².
  */
object StreamingDedup {

  /** Documents must carry (doc_id, text, ts event-time). Documents too
    * short to shingle (< 3 tokens, null signature) pass through
    * unsuppressed — they have no near-dup evidence. */
  def uniqueBySignature(docs: DataFrame,
                        lateness: String = "10 seconds"): DataFrame = {
    val sig = docs.withColumn("sig_key",
      md5(concat_ws("|",
        call_function("graft_minhash", tokens(col("text"))))))
    val withKey = sig.withColumn("dedup_key",
      // null signature (short doc): fall back to the doc's own id so
      // dropDuplicates never collapses two unrelated short docs
      coalesce(col("sig_key"), concat(lit("short:"), col("doc_id"))))
    withKey
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("dedup_key")
      .drop("dedup_key")
  }

  /** Streaming MEDIA admission by exact 64-bit perceptual signature —
    * the media twin of [[uniqueBySignature]], keyed on
    * `graft.multimodal.Multimodal`'s nearBlocks signature (same
    * kernel as batch: frame-sampled byte shingles → four salted
    * 16-bit `graft_simhash` blocks). Emits only the FIRST object of
    * each (media_type, simhash64) class inside the watermark.
    *
    * Exact-signature match is the right STREAMING grain: a
    * byte-identical or lightly re-encoded copy keeps every shingle
    * vote, so its signature is identical and it collapses here with
    * one state row per class; band-level near-dup admission (the
    * Hamming-budget match) stays a batch/verifier concern — a
    * streaming band join would hold per-band cross-doc state and
    * re-admit on every band, which is `candidatePairs`' job to feed
    * a downstream verifier instead. Objects too small to shingle
    * (null signature) pass through unsuppressed — no evidence, no
    * suppression, mirroring [[uniqueBySignature]]'s short docs.
    * Same media type required: identical bytes under different types
    * never collapse (the `dupContent`/`nearBlocks` isolation rule).
    *
    * Input needs (doc_id, media_type, data binary, ts event-time);
    * output keeps the signature as `simhash64` for downstream
    * routing. State: one row per admitted signature class inside the
    * watermark — bounded by `dropDuplicatesWithinWatermark`, exactly
    * like the text path. */
  def uniqueMediaBySignature(media: DataFrame,
                             lateness: String = "10 seconds",
                             frameBytes: Int = 16, nFrames: Int = 4,
                             gram: Int = 4): DataFrame = {
    val M = graft.multimodal.Multimodal
    media
      .withColumn("__tk", M.shingleTokens("data", frameBytes, nFrames, gram))
      .withColumn("simhash64", M.simhash64Of(col("__tk")))
      .drop("__tk")
      .withColumn("media_key",
        // concat is null if the signature is null (concat_ws would
        // silently skip it and merge all small objects of a type)
        coalesce(concat(col("media_type"), lit("|"), col("simhash64")),
          concat(lit("small:"), col("doc_id"))))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("media_key")
      .drop("media_key")
  }

  // carries the watermarked TIMESTAMP column itself — projecting it
  // to millis before the stateful op would strip the watermark tag
  // EventTimeTimeout requires
  case class BandedDoc(band: Int, key: String, doc_id: Long,
                       ts: java.sql.Timestamp)
  case class SpineState(spineId: Long, lastMs: Long)
  case class CandidatePair(id1: Long, id2: Long, band: Int)

  /** LSH candidate-pair stream: for each (band, key) bucket the first
    * doc becomes the spine; every later arrival emits one (spine,
    * doc) pair. Append mode; pairs surface in the micro-batch the
    * collision happens, they never wait for the watermark.
    *
    * RECALL CONTRACT (weaker than batch, stated honestly): emission
    * is SPINE-ANCHORED — only (spine, doc) pairs, never
    * (doc, doc) pairs between two non-spine bucket members. Bucket
    * CO-RESIDENCE is still pigeonhole-complete (the banding is the
    * batch construction verbatim), but a true near-dup pair d2–d3
    * whose every shared bucket is spined by some FAR d1 surfaces
    * only as (d1, d2) and (d1, d3) — candidates a verifier rightly
    * rejects — so the d2–d3 pair is not emitted on the stream. The
    * bound is one state row per bucket, which is the point; keeping
    * member lists per bucket would re-grow state with bucket size.
    * Batch re-banding over the ADMITTED corpus
    * ([[graft.dedup.Dedup]]'s band miners, all-pairs within bucket)
    * remains the recall backstop; the stream's job is early surfacing,
    * not completeness. Same contract as [[mediaCandidatePairs]]
    * (spec-pinned there on the missed-pair shape). */
  def candidatePairs(docs: DataFrame, lateness: String = "10 seconds",
                     stateTtlMs: Long = 60000L): DataFrame = {
    implicit val bandedEnc: ExpressionEncoder[BandedDoc] = ExpressionEncoder()
    implicit val stateEnc: ExpressionEncoder[SpineState] = ExpressionEncoder()
    implicit val pairEnc: ExpressionEncoder[CandidatePair] = ExpressionEncoder()
    implicit val keyEnc: ExpressionEncoder[(Int, String)] = ExpressionEncoder()
    // the batch minhashBands drops the event-time column, and joining
    // a stream back to itself is a stream-stream join — inline the
    // same band construction carrying ts through instead
    val sig = docs.withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"),
        call_function("graft_minhash", tokens(col("text"))).as("sig"))
      .filter(col("sig").isNotNull)
    val bands = (0 until Dedup.NumBands).map { b =>
      val members = (b * Dedup.BandSize until (b + 1) * Dedup.BandSize)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band"), md5(concat_ws("|", members: _*)).as("key"))
    }
    val banded: Dataset[BandedDoc] = sig
      .select(col("doc_id"), col("ts"), explode(array(bands: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("ts"))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk: (Int, String), rows: Iterator[BandedDoc],
         state: GroupState[SpineState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within a batch: smallest doc_id first
            val docs = rows.toSeq.sortBy(d => (d.doc_id, d.ts.getTime))
            if (docs.isEmpty) Iterator.empty
            else {
              val cur = state.getOption
              val spine = cur.map(_.spineId).getOrElse(docs.head.doc_id)
              val lastMs = math.max(cur.map(_.lastMs).getOrElse(0L),
                docs.map(_.ts.getTime).max)
              state.update(SpineState(spine, lastMs))
              state.setTimeoutTimestamp(lastMs + stateTtlMs)
              docs.iterator.filter(_.doc_id != spine)
                .map(d => CandidatePair(spine, d.doc_id, bk._1))
            }
          }
      }
      .toDF()
  }

  case class MediaBanded(media_type: String, band: Int, bits: String,
                         doc_id: Long, simhash64: String,
                         ts: java.sql.Timestamp)
  case class MediaSpineState(spineId: Long, spineSig: String, lastMs: Long)
  case class MediaCandidate(media_type: String, band: Int,
                            id1: Long, id2: Long,
                            sig1: String, sig2: String)

  /** The MEDIA twin of [[candidatePairs]] — streaming band-level
    * near-dup candidate EMISSION, closing the seam
    * [[uniqueMediaBySignature]] deliberately leaves: exact-signature
    * admission collapses byte-identical/re-encoded copies, but a
    * Hamming-budget near-dup (a few flipped signature bits) only
    * surfaces through BANDING, which was batch-only
    * (`Multimodal.nearBlocks`) until now.
    *
    * BUCKETING is nearBlocks' pigeonhole, verbatim: `maxHamming + 1`
    * contiguous blocks of the 64-bit perceptual signature (same
    * [[graft.multimodal.Multimodal.shingleTokens]] +
    * `simhash64Of` kernel as batch, so stream and batch agree
    * bucket for bucket); two signatures within the budget share at
    * least one exact block. Per (media_type, band, bits) bucket the
    * first arrival becomes the spine; every later arrival emits one
    * (spine, doc) candidate carrying BOTH signatures and their
    * `hamming` distance, so the downstream batch verifier needs no
    * refetch — its job is only the `hamming <= budget` filter plus
    * cross-band pair dedup (a pair close on two bands emits twice;
    * per-band state cannot dedupe across keys, and must not — the
    * emission is candidates, [[graft.dedup]]'s routed-verify
    * convention). Objects too small to shingle never reach the
    * banding (no evidence, no candidates), matching the admission
    * path.
    *
    * EMISSION is strictly weaker than batch — the RECALL CONTRACT,
    * stated honestly: batch [[graft.multimodal.Multimodal
    * .nearBlocks]] expands ALL pairs within a bucket, so pigeonhole
    * co-residence implies every true near-dup pair SURFACES; this
    * stream emits spine-anchored pairs only. A true pair d2–d3
    * whose every shared bucket is spined by a d1 outside BOTH docs'
    * Hamming budget reaches the verifier only as the rejectable
    * (d1, d2)/(d1, d3) — the d2–d3 pair itself is never emitted
    * (spec-pinned, the far-spine shape). That is the price of the
    * one-row-per-bucket state bound; batch re-banding over the
    * admitted corpus stays the recall backstop, and the stream's
    * deliverable is EARLY candidates, not complete ones.
    *
    * State bound: ONE (spine id, signature, last-activity) row per
    * ACTIVE bucket — expired by event-time timeout once the
    * watermark passes last activity + `stateTtlMs`, the same bound
    * as the text path. Checkpoint recovery restores the spines, so
    * a restart never re-elects a different spine or re-emits a
    * delivered pair (spec-pinned). */
  def mediaCandidatePairs(media: DataFrame,
                          lateness: String = "10 seconds",
                          stateTtlMs: Long = 60000L,
                          frameBytes: Int = 16, nFrames: Int = 4,
                          gram: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "need 0 <= maxHamming <= 7 (bands of >= 8 bits)")
    implicit val bandedEnc: ExpressionEncoder[MediaBanded] =
      ExpressionEncoder()
    implicit val stateEnc: ExpressionEncoder[MediaSpineState] =
      ExpressionEncoder()
    implicit val pairEnc: ExpressionEncoder[MediaCandidate] =
      ExpressionEncoder()
    implicit val keyEnc: ExpressionEncoder[(String, Int, String)] =
      ExpressionEncoder()
    val M = graft.multimodal.Multimodal
    val sig = media.withWatermark("ts", lateness)
      .withColumn("__tk", M.shingleTokens("data", frameBytes, nFrames, gram))
      .withColumn("simhash64", M.simhash64Of(col("__tk")))
      .drop("__tk")
      .filter(col("simhash64").isNotNull)
    val nBands = maxHamming + 1
    val starts = (0 to nBands).map(k => k * 64 / nBands)
    val bands = (0 until nBands).map { k =>
      struct(lit(k).as("band"),
        substring(col("simhash64"), starts(k) + 1,
          starts(k + 1) - starts(k)).as("bits"))
    }
    val banded: Dataset[MediaBanded] = sig
      .select(col("media_type"), col("doc_id"), col("simhash64"),
        col("ts"), explode(array(bands: _*)).as("bk"))
      .select(col("media_type"), col("bk.band").as("band"),
        col("bk.bits").as("bits"), col("doc_id"), col("simhash64"),
        col("ts"))
      .as[MediaBanded]
    banded
      .groupByKey(d => (d.media_type, d.band, d.bits))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk: (String, Int, String), rows: Iterator[MediaBanded],
         state: GroupState[MediaSpineState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val docs = rows.toSeq.sortBy(d => (d.doc_id, d.ts.getTime))
            if (docs.isEmpty) Iterator.empty
            else {
              val cur = state.getOption
              val spineId = cur.map(_.spineId).getOrElse(docs.head.doc_id)
              val spineSig = cur.map(_.spineSig)
                .getOrElse(docs.head.simhash64)
              val lastMs = math.max(cur.map(_.lastMs).getOrElse(0L),
                docs.map(_.ts.getTime).max)
              state.update(MediaSpineState(spineId, spineSig, lastMs))
              state.setTimeoutTimestamp(lastMs + stateTtlMs)
              docs.iterator.filter(_.doc_id != spineId)
                .map(d => MediaCandidate(bk._1, bk._2, spineId, d.doc_id,
                  spineSig, d.simhash64))
            }
          }
      }
      .toDF()
      // distance attached at emission — the verifier filters, it
      // never refetches payloads
      .withColumn("hamming", expr("graft_hamming(sig1, sig2)"))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch transforms.
  *
  * IMAGE decode, resize and feature extraction are REAL for the
  * formats the JDK ships codecs for (PNG/JPEG/BMP/GIF via
  * `javax.imageio` — no added dependency): [[extractMeta]] reads true
  * pixel dimensions off the stream header, [[resizePixels]]
  * transcodes pixels, and [[extractFeatures]] computes channel
  * statistics over decoded pixels, all spec-driven on real encoded
  * images. Payloads no JDK codec accepts (exotic containers,
  * audio/video — those codecs genuinely aren't in this container)
  * fall back to a deterministic fake, clearly marked, so the
  * Spark-side contract — schema, binary encoding, partitioning, the
  * mapPartitions one-decoder-per-partition shape — is identical on
  * both paths and a JNI/codec swap changes one function.
  */
object Multimodal {

  case class MediaFile(doc_id: Long, media_type: String, data: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
                       width: Int, height: Int, checksum: String)

  /** Build a binary media table from the documents table (the text
    * bytes stand in for encoded media payloads). */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav")
        .as("media_type"),
      encode(col("text"), "UTF-8").as("data"))

  /** Fallback kernel for payloads no JDK codec accepts: deterministic
    * fake dimensions derived from the payload, so the pipeline shape
    * is exercised even on stand-in bytes. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    (n % 640, (n * 7) % 480)
  }

  /** REAL header decode: true pixel dimensions via `javax.imageio`
    * WITHOUT decoding the pixel raster — the reader parses only the
    * stream header (`getWidth/getHeight` on the `ImageReader`), so
    * metadata extraction over a 100 TB image corpus reads headers,
    * not images. Returns None when no installed codec accepts the
    * bytes. */
  private def decodeDims(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (in == null) None
      else
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(in)
              Some((r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally in.close()
    } catch {
      case _: Exception => None
    }

  /** Full pixel decode (None when no codec accepts the bytes). */
  private def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Per-partition metadata extraction over the binary column: real
    * header dimensions where a JDK codec applies, deterministic fake
    * otherwise. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      // one MessageDigest per partition, not per row
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h) = decodeDims(m.data).getOrElse(fakeDecode(m.data))
        md.reset()
        val hex = md.digest(m.data).map("%02x".format(_)).mkString
        MediaMeta(m.doc_id, m.media_type, m.data.length, w, h, hex)
      }
    }
  }

  /** Frame sampling stub: byte-range slices standing in for frame
    * extraction; real plumbing (binary slicing, one row per frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16,
                   nFrames: Int = 4): DataFrame =
    media
      .select(col("doc_id"), col("media_type"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_id"),
        col("data"))
      .select(col("doc_id"), col("media_type"), col("frame_id"),
        col("data").substr(col("frame_id") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
      .filter(length(col("frame")) > 0)

  /** Aspect-preserving target-dimension computation (metadata only —
    * the cheap planning pass a resize job runs first). */
  def resizeMeta(spark: SparkSession, media: DataFrame,
                 maxSide: Int = 224): Dataset[MediaMeta] = {
    import spark.implicits._
    extractMeta(spark, media).map { m =>
      val side = math.max(math.max(m.width, m.height), 1)
      val scale = math.min(1.0, maxSide.toDouble / side)
      m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt)
    }
  }

  case class ResizedMedia(doc_id: Long, media_type: String,
                          width: Int, height: Int, data: Array[Byte])

  /** REAL pixel resize for JDK-decodable images: decode, bilinear
    * Graphics2D scale to `maxSide` on the long edge (never upscale),
    * re-encode as PNG. Rows whose payloads no codec accepts are
    * DROPPED — a resize output must contain only actual images, and
    * the reject path belongs to the caller's triage, not a silent
    * fake. One decode+encode per row, batched per partition. */
  def resizePixels(spark: SparkSession, media: DataFrame,
                   maxSide: Int = 224): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.flatMap { m =>
        decodeImage(m.data).map { img =>
          val side = math.max(math.max(img.getWidth, img.getHeight), 1)
          val scale = math.min(1.0, maxSide.toDouble / side)
          val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
            math.max(1, (img.getHeight * scale).toInt))
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          ResizedMedia(m.doc_id, "image/png", w, h, buf.toByteArray)
        }
      }
    }
  }

  case class MediaFeature(doc_id: Long, embedding: Array[Float])

  /** Feature extraction: for JDK-decodable images, a REAL pixel
    * descriptor — per-channel means and standard deviations over the
    * decoded raster plus 2×2-quadrant per-channel means (dim 16 =
    * 3 means + 3 stds + 4 quadrants × "the dominant-channel layout";
    * concretely: [meanR, meanG, meanB, stdR, stdG, stdB,
    * q00R..q11R, q00G..] truncated/zero-padded to `dim`). Crude but
    * honest: near-duplicate images land near each other in cosine
    * space, which is exactly what the downstream similarity
    * operators need. Non-decodable payloads keep the deterministic
    * byte-fold fake (a neural encoder genuinely isn't in this
    * container — that swap point stays documented). Output shape —
    * `array<float>` keyed by doc_id — feeds Knn.bruteForce /
    * ivfAssign unchanged. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.map { m =>
        decodeImage(m.data) match {
          case Some(img) => MediaFeature(m.doc_id, pixelFeatures(img, dim))
          case None =>
            val v = new Array[Float](dim)
            var i = 0
            while (i < m.data.length) {
              v(i % dim) += (m.data(i) & 0xff) / 255.0f
              i += 1
            }
            MediaFeature(m.doc_id, v)
        }
      }
    }
  }

  private def pixelFeatures(img: java.awt.image.BufferedImage,
                            dim: Int): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Double](3); val sq = new Array[Double](3)
    val quad = Array.ofDim[Double](4, 3); val quadN = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val c = Array(((rgb >> 16) & 0xff) / 255.0,
          ((rgb >> 8) & 0xff) / 255.0, (rgb & 0xff) / 255.0)
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        var ch = 0
        while (ch < 3) {
          sum(ch) += c(ch); sq(ch) += c(ch) * c(ch)
          quad(q)(ch) += c(ch); ch += 1
        }
        quadN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val feats = scala.collection.mutable.ArrayBuffer.empty[Float]
    (0 until 3).foreach(ch => feats += (sum(ch) / n).toFloat)
    (0 until 3).foreach { ch =>
      val mean = sum(ch) / n
      feats += math.sqrt(math.max(0.0, sq(ch) / n - mean * mean)).toFloat
    }
    (0 until 4).foreach { q =>
      (0 until 3).foreach { ch =>
        feats += (if (quadN(q) == 0) 0.0f
                  else (quad(q)(ch) / quadN(q)).toFloat)
      }
    }
    feats.padTo(dim, 0.0f).take(dim).toArray
  }

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                       bits: Int, n_frames: Long, duration_ms: Long)

  case class AudioFeature(doc_id: Long, embedding: Array[Float])

  /** REAL audio header decode for the formats the JDK ships parsers
    * for (WAV/PCM, AIFF, AU via `javax.sound.sampled` — no added
    * dependency): sample rate, channel count, bit depth, frame count
    * and duration off the container header. Rows no JDK parser
    * accepts are dropped (the caller's triage owns rejects). */
  def extractAudioMeta(spark: SparkSession,
                       media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.flatMap { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.data))
          try {
            val f = in.getFormat
            val frames = in.getFrameLength
            val durMs =
              if (frames < 0 || f.getFrameRate <= 0) -1L
              else (frames * 1000.0 / f.getFrameRate).toLong
            Some(AudioMeta(m.doc_id, f.getSampleRate.toInt, f.getChannels,
              f.getSampleSizeInBits, frames, durMs))
          } finally in.close()
        } catch { case _: Exception => None }
      }
    }
  }

  /** REAL audio features for 16-bit PCM: per-window RMS energy over
    * `dim` equal time slices of the first channel — the
    * loudness-envelope descriptor; silence→tone transitions and
    * duplicate clips are separable in cosine space the same way the
    * image channel stats are. Non-PCM/undecodable rows are dropped. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame,
                           dim: Int = 16): Dataset[AudioFeature] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.flatMap { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.data))
          try {
            val f = in.getFormat
            if (f.getSampleSizeInBits != 16) None
            else {
              val bytes = in.readAllBytes()
              val frameSize = f.getFrameSize
              val n = bytes.length / frameSize
              if (n == 0) None
              else {
                val v = new Array[Float](dim)
                val counts = new Array[Long](dim)
                val big = f.isBigEndian
                var i = 0
                while (i < n) {
                  val off = i * frameSize // first channel only
                  val s =
                    if (big) ((bytes(off) << 8) | (bytes(off + 1) & 0xff))
                    else ((bytes(off + 1) << 8) | (bytes(off) & 0xff))
                  val w = math.min(dim - 1, (i.toLong * dim / n).toInt)
                  val x = s / 32768.0
                  v(w) += (x * x).toFloat
                  counts(w) += 1
                  i += 1
                }
                var w = 0
                while (w < dim) {
                  v(w) = if (counts(w) == 0) 0.0f
                         else math.sqrt(v(w) / counts(w)).toFloat
                  w += 1
                }
                Some(AudioFeature(m.doc_id, v))
              }
            }
          } finally in.close()
        } catch { case _: Exception => None }
      }
    }
  }

  /** Oracle-facing metadata query built only from portable expressions
    * (DuckDB 1.0 lacks md5(BLOB), so the checksum hashes the source
    * text — same bytes). */
  def metaQuery(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .withColumn("n_bytes", length(col("data")).cast("int"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        (col("n_bytes") % 640).as("width"),
        ((col("n_bytes") * 7) % 480).as("height"))

  /** Exact multimodal dedup by binary content — the dedup family's
    * media-column member: groups payloads by (media_type, md5, byte
    * length) and reports each duplicate group's canonical id (min),
    * copy count, and reclaimable bytes ((copies−1)·size — what a
    * content-addressed store would save). Same role for binary blobs
    * that `dedup_exact` plays for text.
    *
    * The 100 TB point is WHAT crosses the exchange: payloads are
    * fingerprinted (md5 + length) in the map stage, so the group-by
    * shuffles 40-ish bytes per object, never the object — dedup over
    * a petabyte of images moves only fingerprints. (md5 alone spans
    * 2^128; the length in the key is belt-and-braces and free — it
    * also lets the reclaim arithmetic ride the group key.) */
  /** NEAR-duplicate media matching — the perceptual member the media
    * dedup family lacked next to [[dupContent]]'s exact md5 form: a
    * 64-bit SimHash over frame-byte shingles (sample `nFrames`
    * frames of `frameBytes` bytes — the [[sampleFrames]] convention —
    * then every `gram`-byte sliding window of each frame votes into
    * the signature), banded WITHIN a media type, and verified by
    * exact Hamming distance (`graft_hamming`) ≤ `maxHamming`. A
    * re-encoded or slightly-corrupted payload keeps most of its
    * frame shingles, so its signature lands within a few bits of the
    * original — the content-addressed-store near-match
    * `dupContent`'s exact hash can never make.
    *
    * The signature is 64 bits built as FOUR independently-salted
    * 16-bit `graft_simhash` blocks (salt `#k` appended to every
    * shingle — four independent hash families), for a reason that is
    * pure scale arithmetic: the pigeonhole banding below needs
    * `maxHamming + 1` bands, and a band's BIT WIDTH is the bucket
    * key's entropy. On a 16-bit signature with the default budget a
    * band is 4 bits = 16 possible buckets per media type — buckets
    * grow linearly with the corpus and in-bucket pair expansion goes
    * quadratic (the commonNeighbors-hub failure mode in disguise).
    * At 64 bits a band is 16 bits = 65 536 buckets (the Manku
    * WWW'07 64-bit regime), so expected bucket size — and with it
    * the candidate-pair volume — drops 4 096× at the same corpus
    * size and stays sub-quadratic deep into the billions of objects.
    *
    * Banding gives a PIGEONHOLE RECALL GUARANTEE: the 64 bits split
    * into `maxHamming + 1` contiguous bands, so any pair within the
    * Hamming budget differs in at most `maxHamming` bands and must
    * agree EXACTLY on at least one — every true near-dup surfaces as
    * a candidate (a single-prefix band can't promise that: a media
    * signature has only ~dozens of voting shingles, so even a 1-byte
    * corruption routinely flips a prefix bit). The guarantee holds UP
    * TO the `maxBucket` bound: [[graft.dedup.Dedup.pairRowsOf]] only
    * expands pairs among the first `maxBucket` members of a bucket,
    * so a pair whose every agreeing band lands in a > `maxBucket`
    * (degenerate) bucket can be dropped. A healthy 64-bit banding
    * keeps buckets ~4 orders of magnitude under the cap; audit
    * truncation with [[truncatedBuckets]] before trusting recall on
    * a new corpus.
    *
    * BYTE-vs-CHARACTER seam: shingles are sliced from the BINARY
    * `data` column by BYTES and then cast to string. For ASCII
    * payloads (this repo's fixtures) bytes == characters and the
    * character-slicing DuckDB oracle agrees exactly; a multi-byte
    * UTF-8 payload would split code points at frame boundaries and
    * diverge from any character-based reference. That is acceptable
    * for opaque media bytes (the slicing only needs to be
    * DETERMINISTIC, not linguistic) but callers comparing against a
    * character-sliced oracle must feed ASCII-only data.
    *
    * Scale shape, mirroring `dedup_simhash_pairs`/`dedup_minhash`:
    * the signature is a pure projection (frames, shingles, and the
    * four salted votes all happen in one map stage over ONE shared
    * shingle array — only doc_id + 64 bits ever cross the exchange,
    * never payload bytes); candidate generation is a bucketed
    * (media_type, band, bits) equi-group — NEVER all-pairs — with
    * [[graft.dedup.Dedup.pairRowsOf]] bounding any degenerate
    * bucket's expansion at `maxBucket`. */
  def nearBlocks(media: DataFrame, frameBytes: Int = 16, nFrames: Int = 4,
                 gram: Int = 4, maxHamming: Int = 3,
                 maxBucket: Int = 10000): DataFrame = {
    val bucketed = nearBuckets(media, frameBytes, nFrames, gram, maxHamming)
    graft.dedup.Dedup.pairRowsOf(bucketed, maxBucket)
      .select(col("a.media_type").as("media_type"),
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("graft_hamming(a.simhash64, b.simhash64)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Truncation audit for [[nearBlocks]]: one row per banded bucket
    * that exceeds `maxBucket` (i.e. where [[nearBlocks]]' pigeonhole
    * recall guarantee degrades), with its actual size. Zero rows ⇒
    * the guarantee held exactly on this corpus; any row quantifies
    * the recall exposure before trusting the capped pair list. Same
    * one-map-stage signature build as [[nearBlocks]] — running the
    * audit costs one extra pass, never an uncapped pair expansion. */
  def nearBlocksTruncated(media: DataFrame, frameBytes: Int = 16,
                          nFrames: Int = 4, gram: Int = 4,
                          maxHamming: Int = 3,
                          maxBucket: Int = 10000): DataFrame =
    nearBuckets(media, frameBytes, nFrames, gram, maxHamming)
      .select(col("media_type"), col("band"), col("bits"),
        size(col("items")).cast("long").as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** The frame-sampled byte shingles feeding [[simhash64Of]] — the
    * `data`-column half of the [[nearBlocks]] signature, exposed so
    * the STREAMING media admission
    * (`graft.streaming.StreamingDedup.uniqueMediaBySignature`) runs
    * the identical kernel as batch (the same contract
    * `uniqueBySignature` keeps with `graft_minhash`). Project this
    * into a named column first, then apply [[simhash64Of]] to that
    * column — the two-select chaining builds the shingle array ONCE
    * per row even though four salted blocks read it. */
  def shingleTokens(dataCol: String, frameBytes: Int = 16,
                    nFrames: Int = 4, gram: Int = 4)
      : org.apache.spark.sql.Column = {
    require(frameBytes >= gram && nFrames >= 1,
      "need frameBytes >= gram and at least one frame")
    expr(
      s"""flatten(transform(
         |  filter(transform(sequence(0, ${nFrames - 1}),
         |    i -> cast(substring($dataCol, i * $frameBytes + 1, $frameBytes)
         |              as string)),
         |    f -> length(f) >= $gram),
         |  f -> transform(sequence(1, length(f) - ${gram - 1}),
         |    p -> substring(f, p, $gram))))""".stripMargin)
  }

  /** The 64-bit perceptual signature over a [[shingleTokens]] array:
    * four independently-salted 16-bit `graft_simhash` blocks (salt
    * `#k` on every shingle), concatenated — null when the array is
    * empty (object too small to shingle). */
  def simhash64Of(tk: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat((0 until 4).map(k => call_function("graft_simhash",
      transform(tk, t => concat(t, lit(s"#$k"))))): _*)

  /** Shared signature + banded-bucket build for [[nearBlocks]] and
    * its [[nearBlocksTruncated]] audit. */
  private def nearBuckets(media: DataFrame, frameBytes: Int,
                          nFrames: Int, gram: Int,
                          maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "need 0 <= maxHamming <= 7 (bands of >= 8 bits)")
    // one shared shingle array; each 16-bit block hashes it under its
    // own salt (project chaining so the array is built once per row)
    val sig = media
      .select(col("doc_id"), col("media_type"),
        shingleTokens("data", frameBytes, nFrames, gram).as("tk"))
      .select(col("doc_id"), col("media_type"),
        simhash64Of(col("tk")).as("simhash64"))
      .filter(col("simhash64").isNotNull)
    // maxHamming+1 contiguous bands over the 64 bits (pigeonhole):
    // band k covers [start(k), start(k+1)) with near-equal widths
    val nBands = maxHamming + 1
    val starts = (0 to nBands).map(k => k * 64 / nBands)
    val bands = (0 until nBands).map { k =>
      struct(lit(k).as("band"),
        substring(col("simhash64"), starts(k) + 1, starts(k + 1) - starts(k))
          .as("bits"))
    }
    sig
      .select(col("doc_id"), col("media_type"), col("simhash64"),
        explode(array(bands: _*)).as("bk"))
      .groupBy(col("media_type"), col("bk.band"), col("bk.bits"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("simhash64"), col("media_type"))))
        .as("items"))
      .filter(size(col("items")) > 1)
  }

  def dupContent(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), col("media_type"),
        md5(col("data")).as("content_md5"),
        length(col("data")).cast("long").as("n_bytes"))
      .groupBy(col("media_type"), col("content_md5"), col("n_bytes"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .select(col("media_type"), col("content_md5"), col("n_bytes"),
        col("canonical_id"), col("n_copies"),
        ((col("n_copies") - 1) * col("n_bytes")).as("reclaim_bytes"))
}

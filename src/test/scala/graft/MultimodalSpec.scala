package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary plumbing: schema, per-partition batch decode
  * (stubbed kernels), frame sampling. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(docs)
    val row = media.filter(col("doc_id") === 0).collect()(0)
    assert(row.getAs[String]("media_type") == "image/png")
    val payload = row.getAs[Array[Byte]]("data")
    val text = docs.filter(col("doc_id") === 0).collect()(0).getAs[String]("text")
    assert(new String(payload, "UTF-8") == text)
  }

  test("per-partition metadata extraction is deterministic and complete") {
    val meta = Multimodal.extractMeta(spark, Multimodal.mediaTable(docs))
    assert(meta.count() == docs.count())
    val m = meta.filter(col("doc_id") === 0).collect()(0)
    assert(m.n_bytes > 0 && m.width == m.n_bytes % 640)
    assert(m.checksum.matches("[0-9a-f]{32}"))
    // checksum must equal md5 of the source text bytes
    val viaSql = docs.filter(col("doc_id") === 0)
      .select(md5(col("text"))).collect()(0).getString(0)
    assert(m.checksum == viaSql)
  }

  test("resize stub bounds dimensions while preserving plumbing") {
    val resized = Multimodal.resizeMeta(spark, Multimodal.mediaTable(docs),
      maxSide = 100).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.width <= 100 && m.height <= 100))
  }

  test("media feature vectors flow into the similarity operators") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.mediaTable(docs), dim = 16)
      .toDF().withColumnRenamed("doc_id", "vec_id")
      .withColumn("label", lit(0))
    val knn = graft.similarity.Knn.bruteForce(feats, nQueries = 2, k = 3)
      .collect()
    assert(knn.length == 6) // 2 queries x top-3
    assert(knn.forall(r => r.getAs[Double]("cos_sim") <= 1.0))
  }

  // ---- REAL codecs (JDK javax.imageio: PNG/JPEG/BMP/GIF) ----

  /** Encode a solid-ish image in memory: `tint` fills the top-left
    * quadrant with a second color so quadrant features separate. */
  private def png(w: Int, h: Int, rgb: Int, tintTopLeft: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, if (y < h / 2 && x < w / 2) tintTopLeft else rgb)
    })
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def realMedia = {
    import spark.implicits._
    Seq(
      (1L, "image/png", png(64, 48, 0xff0000, 0xff0000)),  // solid red
      (2L, "image/png", png(64, 48, 0x0000ff, 0x0000ff)),  // solid blue
      (3L, "image/png", png(400, 300, 0x00ff00, 0xffffff)), // green, white TL
      (9L, "application/x-unknown",
        "definitely not an image payload".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
  }

  test("real decode: true header dimensions for JDK formats, fallback otherwise") {
    val meta = Multimodal.extractMeta(spark, realMedia)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 64 && meta(1L).height == 48,
      s"PNG header dims must be real: ${meta(1L)}")
    assert(meta(3L).width == 400 && meta(3L).height == 300)
    // the non-image payload takes the deterministic fallback
    val n = meta(9L).n_bytes
    assert(meta(9L).width == n % 640 && meta(9L).height == (n * 7) % 480)
  }

  test("real resize: pixels transcode, aspect preserved, non-images dropped") {
    val out = Multimodal.resizePixels(spark, realMedia, maxSide = 100)
      .collect().map(r => r.doc_id -> r).toMap
    assert(!out.contains(9L), "non-decodable rows must be dropped, not faked")
    assert(out(3L).width == 100 && out(3L).height == 75,
      s"400x300 at maxSide 100 -> 100x75: ${out(3L)}")
    assert(out(1L).width == 64 && out(1L).height == 48,
      "images under the cap are never upscaled")
    // the re-encoded payload is itself a decodable PNG with the new dims
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(3L).data))
    assert(round.getWidth == 100 && round.getHeight == 75)
    // resized red stays red
    val rgb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).data)).getRGB(32, 24)
    assert(((rgb >> 16) & 0xff) > 200 && (rgb & 0xff) < 50,
      f"red must survive the transcode: 0x$rgb%08x")
  }

  test("real features: channel statistics separate colors; near-dups stay near") {
    import spark.implicits._
    val f = Multimodal.extractFeatures(spark, realMedia, dim = 16)
      .collect().map(x => x.doc_id -> x.embedding).toMap
    // layout: [meanR, meanG, meanB, stdR, stdG, stdB, quadrants...]
    assert(f(1L)(0) > 0.9f && f(1L)(2) < 0.1f, "solid red: meanR high, meanB low")
    assert(f(2L)(2) > 0.9f && f(2L)(0) < 0.1f, "solid blue: meanB high")
    assert(f(1L)(3) < 0.05f, "solid color: near-zero channel std")
    // a resized copy of an image is a near-duplicate in feature space;
    // a different color is not — the property semantic dedup needs
    val resized = Multimodal.resizePixels(spark, realMedia, maxSide = 32)
      .toDF().withColumnRenamed("data", "rdata")
    val rf = Multimodal.extractFeatures(spark,
        resized.select(col("doc_id"), col("media_type"),
          col("rdata").as("data")), dim = 16)
      .collect().map(x => x.doc_id -> x.embedding).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    assert(cos(f(1L), rf(1L)) > 0.999,
      "an image and its resize must be feature near-duplicates")
    assert(cos(f(1L), f(2L)) < 0.5,
      "red vs blue must separate in feature space")
  }

  // ---- REAL audio (JDK javax.sound.sampled: WAV/PCM) ----

  /** Encode a mono 16-bit PCM WAV in memory: `hz` tone (0 = silence)
    * for `ms` milliseconds at 8 kHz. */
  private def wav(hz: Double, ms: Int, rate: Float = 8000f): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = if (hz == 0) 0
        else (math.sin(2 * math.Pi * hz * i / rate) * 20000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("real audio: WAV header metadata and RMS-envelope features") {
    import spark.implicits._
    // doc 1: 440 Hz tone; doc 2: silence-then-tone (half and half);
    // doc 9: not audio at all
    val halfAndHalf = {
      val silent = wav(0, 250); val tone = wav(440, 250)
      // splice at the PCM level: re-render as one clip
      val rate = 8000f
      val n = (rate * 500 / 1000).toInt
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val s = if (i < n / 2) 0
          else (math.sin(2 * math.Pi * 440 * i / rate) * 20000).toInt
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      assert(silent.length + tone.length > 0) // keep the locals honest
      buf.toByteArray
    }
    val media = Seq(
      (1L, "audio/wav", wav(440, 500)),
      (2L, "audio/wav", halfAndHalf),
      (9L, "text/plain", "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
    val meta = Multimodal.extractAudioMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(!meta.contains(9L), "non-audio must be dropped")
    assert(meta(1L).sample_rate == 8000 && meta(1L).channels == 1 &&
      meta(1L).bits == 16, s"${meta(1L)}")
    assert(math.abs(meta(1L).duration_ms - 500L) <= 1, s"${meta(1L)}")
    val f = Multimodal.extractAudioFeatures(spark, media, dim = 8)
      .collect().map(x => x.doc_id -> x.embedding).toMap
    // constant tone: every window carries energy; half-and-half: the
    // first half's windows are silent, the second half's are not
    assert(f(1L).forall(_ > 0.2f), s"tone energy: ${f(1L).toSeq}")
    assert(f(2L).take(4).forall(_ < 0.01f) && f(2L).drop(4).forall(_ > 0.2f),
      s"envelope must localize the tone: ${f(2L).toSeq}")
  }

  test("frame sampling slices bounded byte ranges per frame") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(docs),
      frameBytes = 16, nFrames = 4)
    val f = frames.filter(col("doc_id") === 0).collect()
    assert(f.length == 4)
    assert(f.forall(_.getAs[Array[Byte]]("frame").length <= 16))
    assert(f.map(_.getAs[Int]("frame_id")).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("dupContent groups identical payloads and prices the reclaim") {
    import spark.implicits._
    // three copies of payload A under one type, two of B under
    // another, one singleton: two groups, reclaim (n−1)·bytes each
    val media = Seq(
      (1L, "image/png", "AAAAAAAA"), (5L, "image/png", "AAAAAAAA"),
      (3L, "image/png", "AAAAAAAA"),
      (2L, "audio/wav", "BBBB"), (4L, "audio/wav", "BBBB"),
      (6L, "image/png", "unique-payload"))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))
    val got = Multimodal.dupContent(media).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(("image/png", 1L, 3L, 16L), ("audio/wav", 2L, 2L, 4L)))
  }

  test("dupContent: same bytes under DIFFERENT media types do not merge") {
    import spark.implicits._
    val media = Seq((1L, "image/png", "XX"), (2L, "audio/wav", "XX"))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))
    assert(Multimodal.dupContent(media).isEmpty)
  }

  test("nearBlocks: identical payloads pair at hamming 0, a " +
       "corrupted byte stays near, disjoint payloads don't pair") {
    import spark.implicits._
    // ~430-byte payload sampled as 4 x 64-byte frames -> ~244 voting
    // shingles, so one corrupted byte perturbs ~1.6% of votes and the
    // signature moves ≤ 3 of 64 bits (measured 2). With the DEFAULT
    // 16-byte frames the same corruption is 4 of ~52 shingles and
    // measures hamming 5 — the budget is a statement about edit size
    // RELATIVE to sampled content, which is why frame sampling is a
    // tunable and the Scaladoc says so.
    val base = Seq.tabulate(9)(i =>
      s"block $i of a long media payload with plenty of stable " +
      "shingle mass around it").mkString(" ")
    // doc 3 corrupts ONE byte inside the first sampled frame; the
    // pigeonhole banding GUARANTEES a within-budget pair surfaces as
    // a candidate. doc 9 is an unrelated payload.
    val media = Seq(
      (1L, "image/png", base),
      (3L, "image/png", base.updated(10, 'X')),
      (9L, "image/png", "completely different bytes with no shared " +
        "shingles anywhere in this other payload at all ok"))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))
    val pairs = Multimodal.nearBlocks(media, frameBytes = 64).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h <= 3 },
      s"corrupted twin must pair within the hamming budget: $pairs")
    assert(!pairs.exists { case (a, b, _) => b == 9L || a == 9L },
      s"unrelated payload must not pair: $pairs")
    // byte-identical payloads: hamming exactly 0 at DEFAULT params
    val twin = Multimodal.nearBlocks(Seq(
        (1L, "image/png", base), (2L, "image/png", base))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))).collect()
    assert(twin.map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq ==
           Seq((1L, 2L, 0)))
  }

  test("nearBlocks: same bytes under DIFFERENT media types never " +
       "pair, and candidates come from buckets, not a cross join") {
    import spark.implicits._
    val media = Seq((1L, "image/png", "same payload bytes here"),
        (2L, "audio/wav", "same payload bytes here"))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))
    assert(Multimodal.nearBlocks(media).isEmpty)
    // banding contract on the real corpus: the physical plan is
    // bucket-group + in-bucket expansion — no cartesian/BNL join
    // anywhere, and the exchange carries signatures, never payloads
    val df = Multimodal.nearBlocks(Multimodal.mediaTable(docs))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup candidates must be bucketed, never all-pairs:\n$p")
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("data#"),
        s"exchange must never carry payload bytes: $l"))
  }

  test("nearBlocksTruncated: quantifies recall exposure when a " +
       "bucket exceeds maxBucket, and is silent when none does") {
    import spark.implicits._
    // three byte-identical payloads share every banded bucket, so a
    // maxBucket of 2 truncates each of the 4 bands' buckets (size 3)
    val media = Seq.tabulate(3)(i => (i.toLong, "image/png",
        "one shared payload with enough shingle mass to vote"))
      .toDF("doc_id", "media_type", "txt")
      .select(col("doc_id"), col("media_type"),
        encode(col("txt"), "UTF-8").as("data"))
    val trunc = Multimodal.nearBlocksTruncated(media, maxBucket = 2)
      .collect()
    assert(trunc.nonEmpty && trunc.forall(_.getLong(3) == 3L),
      s"each oversize bucket must surface with its true size: " +
      trunc.mkString(","))
    // at the default cap the same corpus reports zero truncation —
    // the audit's green state matches the recall guarantee's domain
    assert(Multimodal.nearBlocksTruncated(media).isEmpty)
    assert(Multimodal
      .nearBlocksTruncated(Multimodal.mediaTable(docs)).isEmpty,
      "fixture corpus must be truncation-free at the default cap")
  }

  test("dupContent shuffles fingerprints, not payloads") {
    // the exchange feeding the group-by must not carry the binary
    // column — the 100 TB contract is that only (type, md5, length)
    // crosses the wire. Post-AQE plan string, the PlanSpec pattern.
    val df = Multimodal.dupContent(Multimodal.mediaTable(docs))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val exLines = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exLines.nonEmpty, s"no hash exchange in:\n$p")
    exLines.foreach { l =>
      assert(l.contains("content_md5") && !l.contains("data#"),
        s"exchange must key on the fingerprint, never carry bytes: $l")
    }
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch transforms.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * STUBBED with deterministic fakes (clearly marked below). Everything
  * Spark-side — schema, binary encoding, partitioning, the
  * mapPartitions batch shape, metadata extraction — is real and tested.
  * Swapping `fakeDecode` for a JNI/codec call is the only change needed
  * for real media.
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

  /** STUB decode kernel: deterministic fake dimensions derived from the
    * payload. A real implementation would decode the codec header here;
    * the batch-per-partition shape is what matters for scale (one codec
    * init per partition, not per row). */
  private def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    (n % 640, (n * 7) % 480)
  }

  /** Per-partition metadata extraction over the binary column. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      // real pipeline: initialize the decoder once per partition here
      it.map { m =>
        val (w, h) = fakeDecode(m.data)
        val md = java.security.MessageDigest.getInstance("MD5")
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

  /** STUB resize kernel: recomputes target dimensions preserving
    * aspect; a real implementation would transcode pixels here —
    * the metadata/plumbing contract is what downstream consumes. */
  def resizeMeta(spark: SparkSession, media: DataFrame,
                 maxSide: Int = 224): Dataset[MediaMeta] = {
    import spark.implicits._
    extractMeta(spark, media).map { m =>
      val side = math.max(math.max(m.width, m.height), 1)
      val scale = math.min(1.0, maxSide.toDouble / side)
      m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt)
    }
  }

  case class MediaFeature(doc_id: Long, embedding: Array[Float])

  /** STUB feature extraction: a deterministic fake embedding derived
    * from the payload bytes (a real pipeline runs the vision/audio
    * encoder here, batched per partition). The output column shape —
    * `array<float>` keyed by doc_id — is exactly what the similarity
    * operators consume, so media vectors flow straight into
    * Knn.bruteForce / ivfAssign. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      // real pipeline: load the encoder once per partition here
      it.map { m =>
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

  /** Oracle-facing metadata query built only from portable expressions
    * (DuckDB 1.0 lacks md5(BLOB), so the checksum hashes the source
    * text — same bytes). */
  def metaQuery(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .withColumn("n_bytes", length(col("data")).cast("int"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        (col("n_bytes") % 640).as("width"),
        ((col("n_bytes") * 7) % 480).as("height"))
}

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

  test("frame sampling slices bounded byte ranges per frame") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(docs),
      frameBytes = 16, nFrames = 4)
    val f = frames.filter(col("doc_id") === 0).collect()
    assert(f.length == 4)
    assert(f.forall(_.getAs[Array[Byte]]("frame").length <= 16))
    assert(f.map(_.getAs[Int]("frame_id")).sorted.toSeq == Seq(0, 1, 2, 3))
  }
}

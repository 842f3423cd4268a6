package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.similarity.{Knn, Quantize}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("filtered search returns only in-filter neighbors, exact within the gate") {
    // labels split the space; vec 0 queries label 0, vec 1 label 1.
    // label 1 has only TWO non-query members -> k=5 must return 2,
    // not pad from out-of-filter vectors (the post-filter failure)
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 1),
      (2L, Seq(0.9f, 0.1f), 0), (3L, Seq(0.8f, 0.2f), 0),
      (4L, Seq(0.1f, 0.9f), 1), (5L, Seq(0.2f, 0.8f), 1),
      (6L, Seq(0.7f, 0.3f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Knn.filteredSearch(df, nQueries = 2, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(got.forall { case (qid, _, lbl) => lbl == qid.toInt },
      s"out-of-filter neighbor leaked: ${got.toSeq}")
    assert(got.count(_._1 == 0L) == 3 && got.count(_._1 == 1L) == 2,
      s"filtered candidate sets have 3 and 2 members: ${got.toSeq}")
  }

  test("int8 codes stay in [-127,127] and hit ±127 at the max component") {
    val df = embDf(Seq(
      (1L, Seq(0.5f, -2.0f, 1.0f)),
      (2L, Seq(3.0f, 0.0f, -1.5f))))
    val out = Quantize.quantizeInt8(df)
      .select($"vec_id", $"qvec").as[(Long, Seq[Int])].collect().toMap
    out.values.foreach(q => assert(q.forall(v => v >= -127 && v <= 127)))
    // the max-|x| component quantizes to exactly ±127 by construction
    assert(out(1L)(1) == -127)
    assert(out(2L)(0) == 127)
  }

  test("all-zero vector quantizes to zeros with scale 0, no NaN") {
    val row = Quantize.quantizeInt8(embDf(Seq((1L, Seq(0f, 0f, 0f)))))
      .collect()(0)
    assert(row.getSeq[Int](row.fieldIndex("qvec")).toList == List(0, 0, 0))
    assert(row.getAs[Double]("scale8") == 0.0)
    assert(row.getAs[Long]("q_norm2") == 0L)
    assert(row.getAs[Double]("mae8") == 0.0)
  }

  test("reconstruction error honors the round-half bound mae <= scale/2") {
    val out = Quantize.quantizeInt8(
      Tables.embeddings(spark, sf("sf0.001")))
      .select($"scale8", $"mae8").as[(Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (scale, mae) =>
      assert(mae <= scale / 2 + 1e-9, s"mae $mae vs scale $scale")
    }
  }

  test("quantization and quantized search are partitioning-invariant") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Quantize.quantizeInt8(emb).orderBy("vec_id")) ==
      rows(Quantize.quantizeInt8(emb.repartition(7)).orderBy("vec_id")))
    assert(rows(Quantize.searchQuantized(emb).orderBy("qid", "rnk")) ==
      rows(Quantize.searchQuantized(emb.repartition(7))
        .orderBy("qid", "rnk")))
  }

  test("prefix (MRL) search equals full search when dims covers the vector") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val full = Knn.bruteForce(emb)
      .select($"qid", $"rnk", $"vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val pfx = Quantize.searchPrefix(emb, dims = 64)
      .select($"qid", $"rnk", $"vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(pfx == full)
    // a true prefix is cheaper but still returns k ranked rows per query
    val cut = Quantize.searchPrefix(emb, dims = 8).collect()
    assert(cut.length == 25)
  }

  test("IVFSQ8: cells match full-precision IVF; in-cell rank is quantized") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val sq8 = Quantize.ivfSearchQuantized(emb)
      .select($"qid", $"rnk", $"vec_id").as[(Long, Int, Long)]
      .collect()
    assert(sq8.length == 15) // 5 queries x k=3
    // every returned candidate must live in its query's probed cell
    val cells = Knn.ivfAssign(emb)
      .select($"vec_id", $"centroid_id").as[(Long, Long)]
      .collect().toMap
    sq8.foreach { case (qid, _, vid) =>
      assert(cells(vid) == cells(qid), s"$vid not in $qid's cell")
    }
  }

  test("funnel with a corpus-sized pool recovers brute force exactly") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val n = emb.count().toInt
    val full = Knn.bruteForce(emb)
      .select($"qid", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toSeq).toSeq
    val funnel = Quantize.searchFunnel(emb, dims = 16, pool = n)
      .select($"qid", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toSeq).toSeq
    assert(funnel == full)
    // recall is governed by pool and must grow with it (the synthetic
    // embeddings are near-random, so absolute recall at small pools is
    // a data property, not a contract — monotonicity is the contract)
    val top = full.map(r => (r(0), r(2))).toSet
    def recall(pool: Int) = Quantize.searchFunnel(emb, pool = pool)
      .select($"qid", $"vec_id").collect().map(r => (r.get(0), r.get(1)))
      .count(top.contains)
    val (r50, r200) = (recall(50), recall(200))
    assert(r50 >= 5 && r50 <= r200 && r200 <= 25,
      s"recall not monotone: pool50=$r50 pool200=$r200")
  }

  test("quantized search is exact cosine when inputs are already int8") {
    // integer-valued embeddings with max |x| = 127: scale is exactly 1,
    // codes equal inputs, so quantized cosine == float cosine and the
    // two searches agree bit-for-bit
    val rows = (0L to 9L).map { i =>
      (i, 127f +: Seq.tabulate(7)(d => (((i * 7 + d * 13) % 255) - 127).toFloat))
    }
    val df = embDf(rows)
    val exact = Knn.bruteForce(df, nQueries = 3, k = 3)
      .select($"qid", $"rnk", $"vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val quant = Quantize.searchQuantized(df, nQueries = 3, k = 3)
      .select($"qid", $"rnk", $"vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(quant == exact)
  }
}

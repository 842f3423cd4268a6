package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design: every variant is a hash-partitioned groupBy or an
  * equi-join on a derived bucket key — never an all-pairs comparison.
  *  - exact:    one shuffle on md5(text)
  *  - minhash:  shuffle on (band, key) buckets; candidate pairs only
  *              within a bucket (classic MinHash-LSH banding)
  *  - simhash:  one shuffle on doc_id for bit aggregation
  *  - ngram:    shuffle on shingle; pair counting confined to shared
  *              shingles (inverted-index join, not a cross join)
  */
object Dedup {

  /** Exact dedup: canonical id = min(doc_id) over identical texts.
    * Output is a complete doc→canonical mapping (group_size 1 for
    * unique docs). */
  def exact(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("h"))
    documents
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"), col("group_size"))
  }

  val NumHashes = 8
  val BandSize  = 2
  val NumBands: Int = NumHashes / BandSize

  /** MinHash signatures: per doc, `NumHashes` independent minima of
    * seeded portable hashes over its 3-gram shingles. Docs with fewer
    * than 3 tokens get no signature (no shingles). */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    val sh = explode(shingles(col("text"))).as("shingle")
    val aggs = (0 until NumHashes).map(i =>
      min(seededHex16(i, col("shingle"))).as(s"mh$i"))
    documents
      .select(col("doc_id"), sh)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: signature split into `NumBands` bands; band key =
    * md5 of the concatenated member hashes. One row per (doc, band). */
  def minhashBands(documents: DataFrame): DataFrame = {
    val sigs = minhashSignatures(documents)
    val bands = (0 until NumBands).map { b =>
      val members = (b * BandSize until (b + 1) * BandSize)
        .map(i => col(s"mh$i"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", members: _*)).as("key"))
    }
    sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** LSH candidate pairs: docs sharing any band bucket (id1 < id2). */
  def minhashPairs(documents: DataFrame): DataFrame = {
    val b = minhashBands(documents)
    val l = b.select(col("band"), col("key"), col("doc_id").as("id1"))
    val r = b.select(col("band").as("band2"), col("key").as("key2"),
      col("doc_id").as("id2"))
    l.join(r, col("band") === col("band2") && col("key") === col("key2") &&
        col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** 16-bit portable SimHash: bit i of a token's md5 (top bit of hex
    * nibble i) votes +1/−1; sign of the per-bit sum forms the
    * fingerprint bitstring. */
  def simhash(documents: DataFrame): DataFrame = {
    val hexDigit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bitCols = (1 to 16).map { i =>
      sum(when(substring(md5(col("tok")), i, 1).isin(hexDigit: _*), 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(bitCols.head, bitCols.tail: _*)
    val bits = (1 to 16).map(i =>
      when(col(s"b$i") > 0, "1").otherwise("0"))
    agg.select(col("doc_id"), concat(bits: _*).as("simhash16"))
  }

  /** N-gram Jaccard near-duplicates via inverted-index join on distinct
    * shingles: |A∩B| from the shared-shingle join, |A∪B| = |A|+|B|−|A∩B|.
    * Returns the top `k` pairs by similarity (deterministic tiebreak). */
  def ngramJaccardTop(documents: DataFrame, k: Int = 50): DataFrame = {
    val docShingles = documents
      .select(col("doc_id"), explode(array_distinct(shingles(col("text"))))
        .as("shingle"))
    val sizes = docShingles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val l = docShingles.select(col("shingle"), col("doc_id").as("id1"))
    val r = docShingles.select(col("shingle").as("shingle2"),
      col("doc_id").as("id2"))
    val common = l
      .join(r, col("shingle") === col("shingle2") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes).withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("n_shingles", "n1"), "id1")
      .join(broadcast(sizes).withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("n_shingles", "n2"), "id2")
      .select(col("id1"), col("id2"),
        round(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(k)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river edge"), // near dup
    (3L, "completely different words about spark shuffles and partitions here"),
    (4L, "x y")) // too short for 3-gram shingles
    .toDF("doc_id", "text")
    .withColumn("lang", lit("en"))

  test("exact dedup groups identical texts under min doc_id") {
    val got = Dedup.exact(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L), (1L, 0L, 2L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 4L, 1L)))
  }

  test("minhash: identical docs share all signatures; short docs have none") {
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(i => r.getString(i)))
      .toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    assert(!sigs.contains(4L)) // no shingles → no signature
  }

  test("minhash LSH pairs include the exact duplicate pair") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs agree; hamming distance small for near-dups") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(0L) == sh(1L))
    def hamming(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)))
  }

  test("ngram jaccard ranks exact dup above near dup above disjoint") {
    val top = Dedup.ngramJaccardTop(docs, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(top((0L, 1L)) == 1.0)
    assert(top((0L, 2L)) > 0.5 && top((0L, 2L)) < 1.0)
    assert(!top.contains((0L, 3L)))
  }

  test("bounded buckets keep clusters recoverable (maxBucket truncation)") {
    // 6 identical docs: full expansion = 15 pairs; maxBucket=3 keeps
    // the pair count linear but the min-id spine must still connect all
    val many = (0L until 6L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(many, maxBucket = 3)
    val clusters = Dedup.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters.size == 6 && clusters.values.toSet == Set(0L))
    assert(pairs.count() < 15)
  }

  test("near-dup clusters: label propagation finds connected components") {
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {10,11}; singleton pairs only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.nearDupClusters(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (7L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("clusters compose with minhash pairs end to end") {
    val clusters = Dedup.nearDupClusters(Dedup.minhashPairs(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the exact duplicates 0 and 1 must land in the same cluster
    assert(clusters(0L) == clusters(1L))
  }

  test("language id picks the marker-heavy language deterministically") {
    val d = Seq(
      (0L, "the cat and the dog of the house is big", "en"),
      (1L, "el gato la casa de que el perro la", "es")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(d).orderBy("doc_id").collect()
      .map(_.getAs[String]("pred_lang"))
    assert(got.toSeq == Seq("en", "es"))
  }

  test("pii scrub counts and masks emails, ips and phone-shaped spans") {
    val d = Seq(
      (0L, "mail bob@example.com and alice.w@sub.domain.org from 10.0.0.1"),
      (1L, "call 555-867-5309 or 555.867.5309 tomorrow"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(d).orderBy("doc_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((2, 1, 0), (0, 0, 2), (0, 0, 0)))
    // the digest must change iff something was masked
    val base = d.select(col("doc_id"), md5(col("text")).as("m"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val scrubbed = TextAnalysis.piiScrub(d).orderBy("doc_id").collect()
      .map(_.getAs[String]("scrubbed_md5"))
    assert(scrubbed(0) != base(0) && scrubbed(1) != base(1)
      && scrubbed(2) == base(2))
  }

  test("pack bins: per-source bins fill to the budget, deterministic order") {
    val d = (0L until 40L)
      .map(i => (i, Seq.fill(16)("w").mkString(" "), if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.packBins(d, budgetTokens = 64)
      .orderBy("source", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    // 20 docs × 16 tokens per source → bins of exactly 4 docs
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).groupBy(identity).forall(_._2.length == 4))
      assert(rs.map(_._2).toSeq == (1 to 20).map(_ * 16L))
    }
    // pure function of the keys: a second run is row-identical
    val again = TextAnalysis.packBins(d, budgetTokens = 64)
      .orderBy("source", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == again.toSeq)
  }

  test("chunking covers every token; adjacent chunks share exactly the overlap") {
    // documents of every length mod step, including shorter-than-one-chunk
    val d = (1L to 23L)
      .map(i => (i, (1L to i).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val chunk = 6; val overlap = 2; val step = chunk - overlap
    val got = TextAnalysis.chunk(d, chunk, overlap)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    (1L to 23L).foreach { n =>
      val chunks = got(n).sortBy(_._2)
      val expectedChunks = math.max(1, (n + step - 1 - overlap) / step)
      assert(chunks.length == expectedChunks, s"doc $n: ${chunks.length} chunks")
      // sizes: all full except possibly the tail; tail covers through token n
      chunks.init.foreach { case (_, _, sz) => assert(sz == chunk) }
      val (_, lastIdx, lastSz) = chunks.last
      assert(lastIdx * step + lastSz == n,
        s"doc $n: tail chunk ends at ${lastIdx * step + lastSz}")
    }
  }

  test("repetition stats flag the degenerate document") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),            // one bigram 5×
      (2L, "all words unique in this sentence okay"),   // no repeats
      (3L, "x")).toDF("doc_id", "text")                 // no bigrams
    val got = TextAnalysis.repetitionStats(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 drops out
    assert(got(0) == ((1L, 5L, 1.0)))          // 5 bigrams, all the same
    assert(got(1)._3 < 0.2)                    // 6 distinct bigrams of 6
  }

  test("round-4 ops are partitioning-invariant (the determinism premise)") {
    // same input data, adversarial partitioning: results must be
    // row-identical — the property that makes retries, AQE re-plans
    // and cluster-size changes invisible
    val many = (0L until 120L).map(i =>
      (i, (0 to (i % 13).toInt).map(j => s"w${(i * 7 + j) % 23}").mkString(" "),
        s"src${i % 4}")).toDF("doc_id", "text", "source")
    val shuffled = many.repartition(7, col("text"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(TextAnalysis.packBins(many, 32)) ==
      rows(TextAnalysis.packBins(shuffled, 32)))
    assert(rows(TextAnalysis.chunk(many, 6, 2)) ==
      rows(TextAnalysis.chunk(shuffled, 6, 2)))
    assert(rows(TextAnalysis.repetitionStats(many)) ==
      rows(TextAnalysis.repetitionStats(shuffled)))
    assert(rows(operators.Sampling.mixSources(many,
        Seq("src0" -> 0.5, "src1" -> 0.5), 20)) ==
      rows(operators.Sampling.mixSources(shuffled,
        Seq("src0" -> 0.5, "src1" -> 0.5), 20)))
    assert(rows(Dedup.benchmarkOverlap(many, evalMod = 10, topK = 20)) ==
      rows(Dedup.benchmarkOverlap(shuffled, evalMod = 10, topK = 20)))
  }

  test("delta dedup flags only new docs, against corpus and other new docs") {
    val corpus = docs.filter(col("doc_id").isin(0L, 3L))   // 0 = original
    val fresh = docs.filter(col("doc_id").isin(1L, 2L, 4L)) // 1 exact, 2 near
    val got = Dedup.dedupDelta(corpus, fresh).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 1 (exact dup of corpus doc 0) and 2 (near dup) are flagged and
    // blame 0; 4 is too short for shingles; corpus docs never appear
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L)))
    // an increment with NO collisions is empty — corpus-only buckets
    // must produce nothing
    val clean = Dedup.dedupDelta(corpus, docs.filter(col("doc_id") === 3L)
      .withColumn("doc_id", lit(99L))
      .withColumn("text", lit("entirely new content nothing shared with others here")))
    assert(clean.count() == 0)
  }

  test("verified delta dedup rejects only above-threshold collisions, with evidence") {
    val corpus = docs.filter(col("doc_id").isin(0L, 3L))
    val fresh = docs.filter(col("doc_id").isin(1L, 2L, 4L))
    val got = Dedup.dedupDeltaVerified(corpus, fresh).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    // doc 1 is an exact dup of 0 (jaccard 1.0); doc 2 is a near dup
    // above 1/2; doc 4 has no shingles and never collides
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 0L), (2L, 0L)))
    assert(got(0)._4 == 1.0)
    assert(got(1)._4 > 0.5 && got(1)._4 < 1.0)
    // a collision that verifies BELOW threshold is admitted: at a
    // strict-enough threshold the near dup survives, the exact dup
    // still rejects
    val strict = Dedup.dedupDeltaVerified(corpus, fresh, 99L, 100L)
      .collect().map(_.getLong(0))
    assert(strict.toSeq == Seq(1L))
  }

  test("decontamination ranks docs by eval-shingle overlap; eval docs excluded") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // eval (0 % 2 == 0 with mod 2)
      (1L, "alpha beta gamma delta other words here"), // heavy overlap
      (3L, "alpha beta gamma nothing else matches at all"), // some overlap
      (5L, "totally unrelated content with distinct vocabulary okay")) // none
      .toDF("doc_id", "text")
    val got = Dedup.benchmarkOverlap(d, evalMod = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only overlapping non-eval docs appear, ranked by fraction
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    assert(got(0)._2 > got(1)._2)
  }

  test("containment scores an embedded document 1.0 where jaccard cannot") {
    val d = Seq(
      (0L, "a b c d e"),                          // 3 shingles
      (1L, "x y a b c d e p q r s t u v w"),      // contains all of doc 0
      (2L, "entirely different tokens in this document here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentTop(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // all 3 of doc 0's shingles appear in doc 1: containment 1.0 even
    // though jaccard is 3/12 = 0.25
    assert(got.head == ((0L, 1L, 3L, 3L, 1.0)))
    assert(got.length == 1) // doc 2 shares nothing
  }

  test("session-4 dedup ops are partitioning-invariant") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val shuffled = docs.repartition(7)
    assert(rows(Dedup.dupSpans(docs).orderBy("doc_id", "span_start")) ==
      rows(Dedup.dupSpans(shuffled).orderBy("doc_id", "span_start")))
    assert(rows(Dedup.dupRate(docs).orderBy("doc_id")) ==
      rows(Dedup.dupRate(shuffled).orderBy("doc_id")))
    assert(rows(Dedup.containmentTop(docs)) ==
      rows(Dedup.containmentTop(shuffled)))
  }

  test("dup rate merges overlapping span intervals before counting") {
    // doc 0 duplicates shingles at positions 0 and 2 (gap at 1): the
    // token intervals [0,2] and [2,4] OVERLAP at token 2 — naive
    // span_tokens summing would count 6 of 5 tokens
    val d = Seq(
      (0L, "a b c d e"),
      (1L, "a b c x c d e"))
      .toDF("doc_id", "text")
    val got = Dedup.dupRate(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((0L, 5L, 5L, 1.0)))
    // doc 1: positions 0 and 4 -> [0,2] and [4,6], disjoint: 6 of 7
    assert(got(1) == ((1L, 7L, 6L, 0.8571)))
    // a clean doc reports 0.0, not an absent row
    val clean = Seq((0L, "p q r s t"), (1L, "p q r s t"),
      (2L, "totally different words here now")).toDF("doc_id", "text")
    val r2 = Dedup.dupRate(clean).orderBy("doc_id").collect()
    assert(r2.length == 3 && r2(2).getDouble(3) == 0.0)
  }

  test("removeDupSpans cuts every covered position and rejoins the survivors") {
    // docs 0 and 1 share the run "a b c d e"; doc 1 carries extra
    // unique tokens around it; doc 2 is untouched
    val d = Seq(
      (0L, "a b c d e"),
      (1L, "u v a b c d e w z q"),
      (2L, "totally different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 0: fully covered -> empty clean text
    assert(got(0) == ((0L, 5L, 5L, "")))
    // doc 1: the shared [2,6] token run goes; neighbors survive in order
    assert(got(1) == ((1L, 10L, 5L, "u v w z q")), s"${got(1)}")
    // doc 2: no duplicated span -> text reassembles identically
    assert(got(2) == ((2L, 5L, 0L, "totally different words here now")))
  }

  test("dup spans merge adjacent duplicated shingles into maximal runs") {
    val d = Seq(
      (0L, "a b c d e f"),       // shingles: abc bcd cde def
      (1L, "x x a b c d y"),     // shingles: xxa xab abc bcd cdy
      (2L, "p q r"))             // unique shingle, no dup
      .toDF("doc_id", "text")
    val got = Dedup.dupSpans(d).orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // "a b c" and "b c d" occur in docs 0 and 1: doc 0 positions 0-1,
    // doc 1 positions 2-3 — each one maximal 4-token span; doc 2 clean
    assert(got.toSeq == Seq(
      (0L, 0L, 1L, 2L, 4L),
      (1L, 2L, 3L, 2L, 4L)))
  }

  test("dup spans split on gaps and honor the minDf gate") {
    // shared run at both ends of doc 0 with a unique middle -> 2 spans
    val d = Seq(
      (0L, "a b c z z z d e f"),
      (1L, "a b c q q q d e f"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpans(d).orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L), (0L, 6L, 6L),
      (1L, 0L, 0L), (1L, 6L, 6L)))
    // raising minDf above the doc frequency empties the result
    assert(Dedup.dupSpans(d, minDf = 3).count() == 0)
  }

  test("canonicalPerCluster keeps the longest doc, ties to min id") {
    val corpus = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), // cluster 1: 2 and 3 tie on size
      (10L, 50L),                         // unlabeled: survives as itself
      (20L, 10L), (21L, 40L))             // cluster 20: 21 is longest
      .toDF("doc_id", "n_chars")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.canonicalPerCluster(corpus, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 1L, 300L), (10L, 10L, 50L), (21L, 20L, 40L)),
      "longest wins, equal lengths go to the smaller doc_id, " +
        "unlabeled docs are their own cluster")
  }

  test("canonicalPerCluster plans as a partial-combined aggregate, no window") {
    val corpus = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "n_chars")
    val labels = (0L until 100L by 2).map(i => (i, i / 10 * 10))
      .toDF("doc_id", "cluster_id")
    val plan = Dedup.canonicalPerCluster(corpus, labels)
      .queryExecution.executedPlan.toString
    // a window-rank formulation would exchange EVERY corpus row; the
    // argmax must instead partial-combine map-side so only one struct
    // per cluster per partition crosses the shuffle (the struct buffer
    // makes it a SortAggregate — per-partition sort by the group key,
    // no corpus-wide range sort)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_max"), plan)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_max")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "partial aggregation must sit BELOW the exchange: " + plan)
  }

  test("canonicalPerCluster equals the window-rank formulation") {
    val rnd = new scala.util.Random(3)
    val corpus = (0L until 500L).map(i => (i, rnd.nextInt(100).toLong + 1))
      .toDF("doc_id", "n_chars")
    // every 3rd doc joins cluster (i / 9) * 9 — clusters of ≤ 3 docs
    val labels = (0L until 500L by 3).map(i => (i, (i / 9) * 9))
      .toDF("doc_id", "cluster_id")
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val all = corpus.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      all.withColumn("rnk", row_number().over(Window.partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rnk") === 1).drop("rnk")
        .select("doc_id", "cluster_id", "n_chars")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val got = Dedup.canonicalPerCluster(corpus, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == viaWindow)
  }

  // ---- contrastive pair mining ----

  test("contrastivePairs: labels partition the pair space, hamming is true") {
    val out = graft.dedup.Dedup.contrastivePairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getInt(3))))
    // no pair carries both labels, every pair canonical
    val byPair = out.groupBy(_._1)
    byPair.foreach { case (pr, rows) =>
      assert(rows.map(_._2._2).distinct.length == 1, s"pair $pr double-labeled")
      assert(pr._1 < pr._2, s"pair $pr not canonical")
    }
    // positives are exactly the miner's pairs
    val minerPairs = graft.dedup.Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.filter(_._2._2 == 1).map(_._1).toSet == minerPairs)
    // every row's hamming equals the recomputed signature distance
    val sig = graft.dedup.Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case ((a, b), (h, _)) =>
      val expect = sig(a).zip(sig(b)).count { case (x, y) => x != y }
      assert(h == expect, s"pair ($a,$b): hamming $h != $expect")
    }
    // at most one hash-derived negative per document
    assert(out.count(_._2._2 == 0) <= docs.count())
  }

  test("contrastivePairs is deterministic") {
    val a = graft.dedup.Dedup.contrastivePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val b = graft.dedup.Dedup.contrastivePairs(docs.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(a == b)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.text.TextAnalysis

/** Round-4 corpus-analysis operators: TF-IDF distinctive terms,
  * lift-scored collocations, deterministic shuffle-sharding. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // two "languages" with one distinctive term each plus a ubiquitous
  // filler term: idf must demote the filler, not raw frequency
  private val docs = Seq(
    (0L, "en", "alpha filler common words here"),
    (1L, "en", "alpha filler more words again"),
    (2L, "en", "alpha filler yet other words"),
    (3L, "fr", "omega filler common words here"),
    (4L, "fr", "omega filler more words again"),
    (5L, "fr", "omega filler yet other words"))
    .toDF("doc_id", "lang", "text")
    .withColumn("source", lit("src0"))

  test("stripMarkup: blocks drop with contents, tags space out, entities unescape") {
    val cases = Seq(
      // script body contains a tag-shaped string — lazy match must
      // stop at the real closing tag, taking the body with it
      (1L, """before<script>var x = "<b>no</b>";</script>after""",
        "before after"),
      (2L, """<style a="b">p{}</style><p class="x">hi <b>there</b></p>""",
        "hi there"),
      // &amp; unescapes LAST: double-escaped entities stay escaped once
      (3L, "a &amp;lt; b &lt; c &quot;q&quot; &#39;s&#39; &amp; d",
        "a &lt; b < c \"q\" 's' & d"),
      (4L, "no markup at all", "no markup at all"),
      (5L, "<div>\n  spaced\n\n  out\t</div>", "spaced out"),
      // case-insensitive block tags
      (6L, "x<SCRIPT>alert(1)</SCRIPT>y<STYLE>z</STYLE>", "x y"))
      .toDF("doc_id", "html", "want")
    val got = cases
      .select(col("doc_id"), col("want"),
        TextAnalysis.stripMarkup(col("html")).as("clean"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.foreach { case (id, want, clean) =>
      assert(clean == want, s"doc $id: got '$clean', want '$want'")
    }
  }

  test("tfidf ranks the lang-specific term above the ubiquitous one") {
    val got = TextAnalysis.tfidfTerms(docs, topK = 3, minDf = 2)
      .orderBy("lang", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(5)))
    val en = got.filter(_._1 == "en")
    // alpha: tf=3, df=3 → score = 3 * 7/4 = 5.25
    // filler: tf=3, df=6 → score = 3 * 7/7 = 3.0
    assert(en.head._3 == "alpha" && en.head._4 == 5.25)
    assert(en.map(_._3).contains("filler"))
    val enScores = en.map(_._4)
    assert(enScores.zip(enScores.tail).forall(p => p._1 >= p._2),
      "scores must be ranked descending")
    val fr = got.filter(_._1 == "fr")
    assert(fr.head._3 == "omega")
  }

  test("tfidf minDf gate drops terms seen in fewer documents") {
    // every non-filler term appears in >= 2 docs except the doc-unique
    // ones ("common"/"more"/"yet"... appear twice, once per lang block)
    val all = TextAnalysis.tfidfTerms(docs, topK = 100, minDf = 4).collect()
      .map(_.getString(2)).toSet
    assert(all == Set("filler", "words")) // df=6 and df=6; others df<4
  }

  test("collocations: the repeated adjacent pair wins on lift") {
    // "new york" repeats; every other bigram is doc-unique, and the
    // words also occur apart so independence would predict lift ~ 1
    val coll = Seq.tabulate(6)(i =>
      (i.toLong, s"new york alpha$i beta$i gamma$i")) ++ Seq(
      (6L, "new words and york words"),
      (7L, "more new things and york here"))
    val d = coll.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(d, minCount = 5, topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(got.nonEmpty && got.head._1 == "new york")
    assert(got.head._2 == 6L)
    // "new york" co-occurs far above independence: lift >> 1
    assert(got.head._3 > 1.0)
  }

  test("collocations min-count gate drops rare bigrams") {
    val d = Seq((0L, "a b a b a b"), (1L, "c d")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(d, minCount = 3, topK = 10).collect()
      .map(_.getString(0)).toSet
    assert(got.contains("a b"))
    assert(!got.contains("c d")) // count 1 < 3
  }

  test("shuffle shards: total cover, bounded shard ids, contiguous positions") {
    val d = spark.range(200).select(col("id").as("doc_id"))
    val got = Sampling.shuffleShards(d, col("doc_id"), nShards = 4)
      .select(col("doc_id"), col("shard"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 200)
    assert(got.map(_._1).toSet == (0L until 200L).toSet)
    assert(got.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are 1..size within each shard, no gaps
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // a uniform hash keeps shards balanced without a count pass
    val sizes = got.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 200 / 4 / 2, s"degenerate shard split: $sizes")
  }

  test("shuffle shards are partitioning-invariant and seed-sensitive") {
    val d = spark.range(100).select(col("id").as("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shard", "pos").orderBy("shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val base = rows(Sampling.shuffleShards(d, col("doc_id")))
    assert(rows(Sampling.shuffleShards(d.repartition(7), col("doc_id"))) == base)
    assert(rows(Sampling.shuffleShards(d.coalesce(1), col("doc_id"))) == base)
    val other = rows(Sampling.shuffleShards(d, col("doc_id"), seed = 7))
    assert(other != base, "a different seed must yield a different permutation")
    assert(other.map(_._1).toSet == base.map(_._1).toSet)
  }

  test("tfidf and collocations are partitioning-invariant") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val shuffled = docs.repartition(5)
    assert(rows(TextAnalysis.tfidfTerms(docs).orderBy("lang", "rnk")) ==
      rows(TextAnalysis.tfidfTerms(shuffled).orderBy("lang", "rnk")))
    assert(rows(TextAnalysis.collocations(docs, minCount = 2)
        .orderBy(col("lift").desc, col("bigram"))) ==
      rows(TextAnalysis.collocations(shuffled, minCount = 2)
        .orderBy(col("lift").desc, col("bigram"))))
  }

  test("admission gate: both reasons fire; every input doc gets a row") {
    val d = Seq(
      (0L, "a b a b a b"),          // in-vocab, no cross-doc dup -> keep
      (1L, "c d e"),                // out-of-vocab bigrams -> low_quality
      (2L, "p q r s t u"),          // identical to 3 -> duplication
      (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.admissionGate(d, vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(4), Option(r.get(5))))
    assert(got.toSeq == Seq(
      (0L, true, None),
      (1L, false, Some("low_quality")),
      (2L, false, Some("duplication")),
      (3L, false, Some("duplication"))))
  }

  test("LM admission gate: duplication and perplexity reasons fire; full assignment") {
    val d = Seq(
      (0L, "a b a b a b"),          // seen transitions -> low nll -> keep
      (1L, "c d e"),                // hapax bigrams -> high nll
      (2L, "p q r s t u"),          // identical to 3 -> duplication
      (3L, "p q r s t u"),
      (4L, "solo"))                 // no bigrams -> no LM evidence
      .toDF("doc_id", "text")
    // corpus nlls: doc 0 scores the often-seen a/b transitions, doc 1
    // the hapax tail — a threshold between them splits on perplexity
    val nlls = TextAnalysis.lmScore(d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString.toDouble))
      .toMap
    assert(nlls(0L).get < nlls(1L).get)
    val cut = (nlls(0L).get + nlls(1L).get) / 2
    val got = TextAnalysis.admissionGateLm(d, maxAvgNll = cut)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(5), Option(r.get(6))))
    assert(got.toSeq == Seq(
      (0L, true, None),
      (1L, false, Some("high_perplexity")),
      (2L, false, Some("duplication")),
      (3L, false, Some("duplication")),
      (4L, false, Some("high_perplexity"))))
  }

  test("LM coverage scores by top-V bigram membership; short docs drop") {
    val d = Seq(
      (0L, "a b a b a b"),   // bigrams: "a b" x3, "b a" x2
      (1L, "c d e"),         // bigrams: "c d", "d e" — once each
      (2L, "solo"))          // no bigrams -> absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmCoverageScore(d, vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vocab = {"a b", "b a"}: doc 0 fully in-vocab, doc 1 fully out
    assert(got.toSeq == Seq((0L, 5L, 5L, 1.0), (1L, 2L, 0L, 0.0)))
    // boundary tie at count 1 breaks by bigram string: vocabSize 3
    // admits "c d" (lexicographically before "d e")
    val tied = TextAnalysis.lmCoverageScore(d, vocabSize = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(tied.toSeq == Seq((0L, 5L), (1L, 1L)))
  }

  test("corpus mix: shares sum to 1 over (lang, source) cells") {
    val d = Seq(
      (0L, "one two three", "en", "web"),
      (1L, "quatre cinq", "fr", "web"),
      (2L, "six seven eight nine ten", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.corpusMix(d).orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("en", "books", 1L, 5L, 0.5),
      ("en", "web", 1L, 3L, 0.3),
      ("fr", "web", 1L, 2L, 0.2)))
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-9)
  }

  test("bigram-LM score: repeated text scores likelier than unseen transitions") {
    val d = Seq(
      (0L, "a b a b a b"),   // transitions the corpus has seen often
      (1L, "c d e"),         // each bigram unique in the corpus
      (2L, "solo"))          // no bigrams -> n 0, null score
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(d)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 5L), (1L, 2L), (2L, 0L)))
    // hand-computed with k=1, V=6 unigram types:
    // doc0: 3·ln(4/9) + 2·ln(3/9) over 5 bigrams, negated
    val nll0 = -(3 * math.log(4.0 / 9) + 2 * math.log(3.0 / 9)) / 5
    assert(math.abs(got(0)._3.get - nll0) < 1e-3, s"doc0: ${got(0)._3}")
    assert(got(0)._3.get < got(1)._3.get,
      "frequent transitions must score a lower avg NLL than unseen ones")
    assert(got(2)._3.isEmpty, "a bigram-less doc has no score")
  }
}

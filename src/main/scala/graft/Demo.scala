package graft

import org.apache.spark.sql.functions._

import graft.operators.Movements
import graft.streaming.MouseStream
import graft.sources.RateJsonSource

/** End-to-end demo of the reference application's user journey on the
  * Spark engine (SURVEY §3): live ingest → per-second aggregation →
  * the three query surfaces (incremental chart poll, initial load,
  * heatmap), printed to stdout. `runMain graft.Demo [seconds]`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val runSecs = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.get()

    println(s"--- ingest: rate source -> wire JSON -> windowed agg (${runSecs}s) ---")
    val wire = new RateJsonSource(eventsPerSec = 5000, users = 5).load(spark)
    val query = MouseStream.startToMemory(spark,
      MouseStream.parse(wire), "demo_movements")
    // no processAllAvailable: the rate source is unbounded — it would
    // never drain; the sleep bounds the demo
    Thread.sleep(runSecs * 1000L)
    query.stop()

    println("--- initial load (reverse=true, functions.js:312) ---")
    val initial = MouseStream.range(spark, "demo_movements", "u1",
      fromSec = Long.MaxValue / 2000, reverse = true, limit = Some(10))
    initial.show(5, truncate = false)

    println("--- incremental poll + SUM (functions.js:151-187) ---")
    val (total, token) = MouseStream.pollSum(
      MouseStream.range(spark, "demo_movements", "u1", fromSec = 0L))
    println(s"total_events=$total continuation_token=$token")

    println("--- heatmap read (limit=10&count=false, functions.js:351) + batch pipeline ---")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Movements.heatmap(ev, userId = 1).orderBy(col("value").desc).show(5)
    val fused = Movements.heatmapFused(ev, userId = 1)
    println(s"fused: ${fused.points.length} points, max=${fused.max}")

    println("--- corpus pipeline: dedup -> scrub -> quality -> chunk -> pack ---")
    import graft.text.TextAnalysis
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    val exactDups = Dedup.exact(docs).filter(col("group_size") > 1).count()
    val flagged = Dedup.dedupDelta(
      corpus = docs.filter(col("doc_id") % 5 =!= 0),
      fresh = docs.filter(col("doc_id") % 5 === 0)).count()
    val lowQuality = TextAnalysis.repetitionStats(docs)
      .filter(col("top_gram_frac") > 0.2).count()
    val pii = TextAnalysis.piiScrub(docs)
      .agg(sum(col("n_emails") + col("n_ips") + col("n_phones"))).head().get(0)
    val chunks = TextAnalysis.chunk(docs).count()
    val bins = TextAnalysis.packBins(docs)
      .agg(countDistinct(col("source"), col("bin"))).head().getLong(0)
    println(s"docs=$nDocs rows-in-dup-groups=$exactDups delta-flagged=$flagged " +
      s"high-repetition=$lowQuality pii-spans=$pii chunks=$chunks shards=$bins")

    println("--- canonical pick: near-dup clusters x PageRank ---")
    // within each duplicate cluster, keep the most-connected copy:
    // cluster membership from label propagation, the keep-choice from
    // PageRank over the SAME similarity graph (ties -> min doc_id)
    val pairs = Dedup.simhashPairs(docs).select("id1", "id2").localCheckpoint()
    val clusters = Dedup.nearDupClusters(pairs)
    val pr = operators.GraphOps.pageRank(pairs, iterations = 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("pr").desc, col("doc_id"))
    val canonical = clusters.join(pr, clusters("doc_id") === pr("node"))
      .select(col("cluster_id"), col("doc_id"), col("pr"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    println(s"clusters=${canonical.count()} canonical picks, e.g.:")
    canonical.orderBy(col("pr").desc).show(3, truncate = false)

    println("--- retrieval + epoch order: bm25 -> rrf fuse -> shuffle shards ---")
    import spark.implicits._
    val qs = Seq((1L, "spark window agg")).toDF("qid", "query")
    val lex = graft.text.Retrieval.bm25(docs, qs)
    lex.show(3, truncate = false)
    val sem = graft.text.Retrieval.semanticTopK(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), Map(1L -> 10L))
    val fusedRet = graft.text.Retrieval.rrfFuse(
      lex.select(col("qid"), col("doc_id").as("item"), col("rnk")),
      sem.select(col("qid"), col("vec_id").as("item"), col("rnk")))
    fusedRet.show(3, truncate = false)
    val order = operators.Sampling.shuffleShards(docs, col("doc_id"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n")).orderBy("shard")
    println("epoch-order shards: " + order.collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))

    println("--- quality gate + int8 embedding store ---")
    // the ingest gate every batch passes before admission...
    val gate = operators.Expectations.lineitemSuite(
      Tables.lineitem(spark, "/root/testdata/sf0.001"))
    gate.orderBy(col("pass_rate"), col("rule")).show(4, truncate = false)
    // ...and the 4×-smaller vector store the ANN tier serves from
    val q8 = similarity.Quantize.quantizeInt8(
      Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val mae = q8.agg(max(col("mae8"))).head().getDouble(0)
    val hits = similarity.Quantize.searchQuantized(
      Tables.embeddings(spark, "/root/testdata/sf0.001")).count()
    println(s"quantized vectors=${q8.count()} worst-mae=$mae topk-rows=$hits")

    spark.stop()
  }
}

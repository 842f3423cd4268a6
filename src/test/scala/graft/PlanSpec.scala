package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Plan-shape regression tests: the properties that make queries
  * scale-safe must survive refactors — filter pushdown into the scan,
  * column pruning, broadcast dimension joins, top-k via
  * TakeOrderedAndProject, partial aggregation. Checked on the final
  * (post-AQE) plan after execution. */
class PlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("q1: shipdate filter pushes into the parquet scan; columns pruned") {
    val p = finalPlan(q("q1_pricing"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan reads columns the query never uses")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q5: all dimension joins broadcast; no sort-merge join") {
    val p = finalPlan(q("q5_region_revenue"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort job") {
    val p = finalPlan(q("topk_lineitems"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("heatmap: user filter pushes to the scan; recent-secs limit is top-k") {
    val p = finalPlan(q("mov_heatmap"))
    assert(p.contains("EqualTo(user_id,1)"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("semi join stays a broadcast LeftSemi") {
    val p = finalPlan(q("join_semi_segments"))
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"))
  }

  test("whole-stage codegen covers the q1 pipeline") {
    val p = finalPlan(q("q1_pricing"))
    assert(p.split("\n").exists(_.contains("*(")),
      "no whole-stage codegen stages in final plan")
  }

  test("q9: name-filtered part dim broadcasts; partial aggregation") {
    val p = finalPlan(q("q9_product_profit"))
    assert(p.contains("BroadcastHashJoin"), s"part/supplier/nation dims must broadcast:\n$p")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert(p.contains("PushedFilters"), "part name filter not at the scan")
  }

  test("q21: no cartesian product; distinct aggs stay partial") {
    val p = finalPlan(q("q21_waiting_suppliers"))
    assert(!p.contains("CartesianProduct"), s"q21 planned a cartesian:\n$p")
    assert(p.contains("partial_count"), "per-order aggregate lost its partial phase")
    // the double-countDistinct formulation planned an Expand that
    // replicated every joined row 3× before the exchange; the
    // per-(order, supplier) pre-aggregate must keep the plan Expand-free
    assert(!p.contains("Expand"), s"q21 reintroduced a distinct-agg Expand:\n$p")
  }

  test("per-group heavy hitters: candidates arrive via semi-join, not In literal") {
    val p = finalPlan(q("hh_group_terms"))
    assert(p.contains("LeftSemi"),
      s"candidate filter should be a semi-join:\n$p")
    assert(!p.contains("INSET") && !p.contains(" IN ("),
      "candidate set embedded in the plan as a literal In/InSet — " +
        "driver-side materialization leaked back in")
  }

  test("mix sources: broadcast targets, rank pruned before the sort") {
    val p = finalPlan(q("sample_mix_sources"))
    assert(p.contains("BroadcastHashJoin"),
      s"per-source targets must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "rank filter should prune partitions before the full sort")
  }

  test("decontamination: eval shingles broadcast, no doc-doc join") {
    val p = finalPlan(q("doc_decontaminate"))
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here means the corpus shuffled on shingle:\n$p")
  }

  test("semantic prune: cell grouping exchange is reused, not recomputed") {
    val p = finalPlan(q("emb_semantic_prune"))
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage"),
      s"pair expansion and member explode should share one exchange:\n$p")
  }

  test("cms: the per-term aggregate exchange is shared by sketch, top-k and exact branches") {
    val p = finalPlan(q("cms_term_counts"))
    assert(p.contains("ReusedExchange"),
      s"sketch/top-k/exact must consume ONE term aggregate (one scan):\n$p")
  }

  test("pagerank: rank vector broadcasts against the edge list each round") {
    val p = finalPlan(q("graph_pagerank"))
    assert(!p.contains("SortMergeJoin"),
      s"at bench scale the rank vector should broadcast (AQE):\n$p")
  }

  test("q11: scalar-subquery threshold is a broadcast, not a driver collect") {
    val p = finalPlan(q("q11_part_value"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"single-row total should broadcast:\n$p")
  }

  test("tfidf: doc count broadcasts; per-lang top-k rank is group-limited") {
    val p = finalPlan(q("doc_tfidf_terms"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row doc count must broadcast (scalar-subquery idiom):\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-lang rank filter should prune partitions before the sort:\n$p")
  }

  test("collocations: global top-k is TakeOrderedAndProject, totals broadcast") {
    val p = finalPlan(q("doc_collocations"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not materialize a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row corpus totals must broadcast:\n$p")
  }

  test("bm25: corpus exchange reused for the df branch; rank group-limited") {
    val p = finalPlan(q("ret_bm25"))
    assert(p.contains("ReusedExchange"),
      s"the tf exchange should be reused by the df branch " +
        s"(one corpus explode, not two):\n$p")
    assert(p.contains("WindowGroupLimit"),
      "per-query rank filter should prune partitions before the sort")
    assert(!p.contains("SortMergeJoin"),
      s"query vocab / df / stats sides must broadcast, not shuffle-join:\n$p")
  }

  test("shuffle shards: one exchange on shard, no global sort of the input") {
    val df = operators.Sampling.shuffleShards(
      Tables.documents(spark, sf("sf0.001")),
      org.apache.spark.sql.functions.col("doc_id"))
    val p = finalPlan(df)
      .split("== Initial Plan ==").head // AQE dumps final + initial
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly one hash exchange (on shard), got $exchanges:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a range exchange means a global total order materialized:\n$p")
  }

  test("forget audit: the forget-set broadcasts; artifacts never shuffle for it") {
    val p = finalPlan(q("doc_forget"))
    assert(p.contains("BroadcastHashJoin"),
      s"forget-set must broadcast against each artifact:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"an artifact shuffled to meet the (tiny) forget-set:\n$p")
  }

  test("MRL funnel: query set broadcasts in both stages") {
    val p = finalPlan(q("knn_funnel"))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"candidate re-rank lost its broadcast:\n$p")
  }

  test("bigram LM score: vocab size broadcasts; counts aggregate partially") {
    val p = finalPlan(q("doc_lm_score"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the 1-row V scalar must broadcast, not shuffle:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"n-gram counts lost map-side partial aggregation:\n$p")
  }

  test("M4 downsample: no window sort; picks ride partial aggregation") {
    val p = finalPlan(q("ts_m4_downsample"))
    assert(!p.contains("Window"),
      s"first/last must come from struct-min/max, not a bucket window:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"bucket aggregation lost its map-side combine:\n$p")
  }

  test("salted join: the join key carries the salt") {
    val p = finalPlan(q("join_salted"))
    assert(p.contains("_salt"),
      s"salted join plan shows no salt in its keys:\n$p")
  }

  test("expectation gate: one scan feeds one aggregate") {
    val p = finalPlan(q("qc_expectations"))
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one lineitem scan, got $scans:\n$p")
  }

  test("MAD gate: per-group stat tables broadcast; rows never sort-merge") {
    val p = finalPlan(q("qc_mad_outliers"))
    assert(p.contains("BroadcastHashJoin"),
      s"stat-table joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"row side fell into a sort-merge exchange:\n$p")
  }

  test("LM coverage: vocab is top-k, broadcast against the bigrams") {
    val p = finalPlan(q("doc_lm_coverage"))
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab selection materialized a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$p")
  }

  test("LM score: count relations broadcast; no corpus sort-merge join") {
    // the round-7 restructure's contract: the tagged probe joins ride
    // broadcasts (weights are vocab-sized), so the only exchanges are
    // the tiny count aggregate and the per-doc partial agg — a
    // regression to a corpus-sized SortMergeJoin would show here
    val p = finalPlan(q("doc_lm_score"))
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"the weight join must broadcast:\n$p")
    val smjCorpus = "SortMergeJoin".r.findAllIn(p).length
    // the spine LEFT JOIN (doc-count-sized) may legitimately
    // sort-merge; anything beyond that single join is a regression
    assert(smjCorpus <= 1,
      s"expected at most the spine join to sort-merge, got $smjCorpus:\n$p")
  }

  test("dup spans: exactly one window pass, partitioned by document") {
    val p = finalPlan(q("dedup_dup_spans"))
      .split("== Initial Plan ==").head
    val windows = "Window ".r.findAllIn(p).length
    assert(windows == 1, s"expected one gaps-and-islands window, got $windows")
  }

  test("routed dedup: verification reads only candidate docs (semi-join prune)") {
    // the prune executes inside the eager localCheckpoint, so it never
    // appears in the OUTPUT's executed plan — capture every query
    // execution the operator triggers instead
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries("dedup_route")(spark, sf("sf0.001")).collect()
      // listener delivery is async on the bus — poll
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var found = false
      while (!found && System.nanoTime() < deadline) {
        found = captured.iterator().asScala.exists(_.contains("LeftSemi"))
        if (!found) Thread.sleep(100)
      }
      // the scale contract: the verification shingle relation is built
      // from docs LEFT-SEMI-joined against the mined candidate pairs —
      // never from the full corpus
      assert(found, "candidate-doc pruning disappeared from the routed join")
    } finally spark.listenerManager.unregister(listener)
  }

  test("rate anomalies: the window runs over bucket summaries, not events") {
    val plan = SparkEntry.queries("ts_anomaly")(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan
    // the aggregate must sit BELOW the window: the windowed relation
    // is the (type, bucket) summary, whose cardinality is time-bounded
    val winChildren = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.child
    }
    assert(winChildren.nonEmpty)
    assert(winChildren.forall(c => c.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty), "window must consume the bucket aggregate, not raw events")
  }

  test("spatial ε-join: candidates via equi-join, never a nested loop") {
    val p = finalPlan(q("join_spatial_grid"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"the grid keys must make this an equi-join:\n$p")
  }

  test("attribution: the time-binned pairing is an equi-join, never a nested loop") {
    val p = finalPlan(q("ts_attribution"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"the (user, bin) keys must make this an equi-join:\n$p")
  }

  test("LSH mutual-kNN: the bucket self-join is hash-keyed, not broadcast-nested") {
    val p = finalPlan(q("emb_mutual_knn_lsh"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"bucket equality must drive the candidate join:\n$p")
  }

  test("common neighbors: the wedge join is keyed on the middle; no nested loop") {
    val p = finalPlan(q("graph_common_neighbors"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"wedges must form via the src equi-key:\n$p")
  }

  test("componentsDelete: the deleted-set anti-join broadcasts, never " +
       "sort-merges the prior edge relation (VERDICT r14 item 5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the seam componentsDelete feeds: prior canonical edges minus the
    // deleted set — the doc's cost model ("a daily deletion batch is
    // small, it broadcasts") is a pinned hint, not a stats hope
    val prior = (1L to 2000L).map(i => (i, i + 1L)).toDF("a", "b")
    val del = Seq((10L, 11L), (500L, 501L)).toDF("a", "b")
    val p = finalPlan(
      graft.operators.GraphOps.survivingEdges(prior, del))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"deleted-set anti must be a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the |E| prior side must never sort-merge against the deletes:\n$p")
  }

  test("survivingEdges past the broadcast envelope degrades to a " +
       "shuffled anti-join, never a pinned broadcast (ADVICE r15)") {
    import spark.implicits._
    // with stats-based auto-broadcast off, the plan shape is decided
    // ENTIRELY by the envelope verdict — small=false must shuffle
    // (the OOM-safe degradation), small=true must still broadcast
    // (the pinned hint overrides the disabled estimator)
    val prior = (1L to 2000L).map(i => (i, i + 1L)).toDF("a", "b")
    val del = Seq((10L, 11L), (500L, 501L)).toDF("a", "b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = finalPlan(
        graft.operators.GraphOps.survivingEdges(prior, del, small = false))
      assert(!gated.contains("BroadcastHashJoin") &&
        gated.contains("LeftAnti"),
        s"past the envelope the anti-join must not broadcast:\n$gated")
      val hinted = finalPlan(
        graft.operators.GraphOps.survivingEdges(prior, del, small = true))
      assert(hinted.contains("BroadcastHashJoin"),
        s"inside the envelope the pinned hint must hold:\n$hinted")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

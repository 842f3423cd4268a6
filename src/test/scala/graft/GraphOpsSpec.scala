package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Integer-exact PageRank: structural sanity (symmetry, hubs win),
  * partitioning invariance, and mass accounting under floor
  * division. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("path graph a-b-c: endpoints tie, middle node ranks highest") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val pr = GraphOps.pageRank(pairs, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == pr(3L), "symmetric endpoints must tie exactly")
    assert(pr(2L) > pr(1L), "the middle node has both endpoints feeding it")
  }

  test("star graph: the hub outranks every leaf; leaves tie") {
    val pairs = (2L to 6L).map(l => (1L, l)).toDF("id1", "id2")
    val pr = GraphOps.pageRank(pairs, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaves = (2L to 6L).map(pr)
    assert(leaves.distinct.size == 1, "leaves are interchangeable")
    assert(pr(1L) > leaves.head)
  }

  test("partitioning invariance: identical ranks at 1 and 7 partitions") {
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).toDF("id1", "id2")
    val a = GraphOps.pageRank(pairs.repartition(1), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = GraphOps.pageRank(pairs.repartition(7), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("canonical pick composition: per-cluster argmax(pr) selects each cluster's hub") {
    import org.apache.spark.sql.expressions.Window
    // two disjoint stars — cluster ids are the min member label
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L), (10L, 12L))
      .toDF("id1", "id2")
    val clusters = graft.dedup.Dedup.nearDupClusters(pairs)
    val pr = GraphOps.pageRank(pairs, iterations = 10)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("pr").desc, col("doc_id"))
    val picks = clusters.join(pr, clusters("doc_id") === pr("node"))
      .select(col("cluster_id"), col("doc_id"), col("pr"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(picks == Map(1L -> 1L, 10L -> 10L))
  }

  test("mass is conserved up to floor-division loss: sum(pr) in (scale - n·(iters+2), scale]") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("id1", "id2")
    val iters = 10
    val total = GraphOps.pageRank(pairs, iters).agg(sum("pr")).collect()(0).getLong(0)
    // floor-division loss per iteration < Σdeg (contrib divs) + n
    // (damping div) + n+1 (base div) = 10+4+5 = 19 for this graph;
    // 1000 over-covers 10 iterations + init — still 1e-9 of scale
    val maxLoss = 1000L
    assert(total <= Scale && total > Scale - maxLoss, s"total=$total")
  }

  test("triangle census: exact counts on a hand-built graph") {
    import spark.implicits._
    // K3 on {1,2,3} plus a pendant edge 3-4; reversed/duplicate rows
    // must collapse to the same canonical edges
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L),          // reverse duplicate -> same canonical edge
      (4L, 3L))          // duplicate
      .toDF("id1", "id2")
    val r = graft.operators.GraphOps.triangleCensus(pairs).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    // ordered wedges: (1,2)-(2,3), (1,3)-(3,4), (2,3)-(3,4) -> 3
    assert(r.getAs[Long]("n_wedges") == 3L)
    assert(r.getAs[Double]("closure8") == 1.0)
  }

  test("triangle census: self-loops and empty graphs are safe") {
    import spark.implicits._
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("id1", "id2")
    val r = graft.operators.GraphOps.triangleCensus(loops).collect()(0)
    assert(r.getAs[Long]("n_edges") == 0L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("closure8") == 0.0)
  }
}

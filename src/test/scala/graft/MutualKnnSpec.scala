package graft

import org.apache.spark.sql.functions._

import graft.similarity.Knn

/** Mutual-kNN clustering semantics: the mutuality gate (one-directional
  * admiration is not an edge), group separation under cosine, full
  * labeling including isolates, and size bookkeeping. */
class MutualKnnSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight angular groups plus one orthogonal loner: group A
    * fans out from the x-axis, group B from the y-axis (max cross
    * cosine ≈ 0.05), the loner sits on z with cosine 0 to everyone. */
  private lazy val groups = {
    val a = (0L until 10L).map(i =>
      (i, Array(1.0f, 0.005f * i, 0.0f)))
    val b = (10L until 20L).map(i =>
      (i, Array(0.005f * (i - 10L), 1.0f, 0.0f)))
    (a ++ b :+ ((20L, Array(0.0f, 0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
  }

  test("mutuality gate: a hub in everyone's top-1 yields only ONE edge") {
    // hub at angle 0; satellites at 10°, -12°, 25° — each satellite's
    // nearest is the hub, but the hub reciprocates only its own
    // nearest (the 10° one), so k=1 admits exactly that pair
    def ang(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq(
      (0L, ang(0)), (1L, ang(10)), (2L, ang(-12)), (3L, ang(25)))
      .toDF("vec_id", "embedding")
    val byId = Knn.mutualKnnClusters(emb, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(0L) == (0L, 2L) && byId(1L) == (0L, 2L),
      "hub and its reciprocated nearest form the one 2-cluster")
    assert(byId(2L) == (2L, 1L) && byId(3L) == (3L, 1L),
      "unreciprocated satellites are singletons")
  }

  test("angular groups never merge; the orthogonal loner is a singleton") {
    val out = Knn.mutualKnnClusters(groups, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 21, "every vector is labeled exactly once")
    val label = out.map(t => t._1 -> t._2).toMap
    val aLabels = (0L until 10L).map(label).toSet
    val bLabels = (10L until 20L).map(label).toSet
    assert(aLabels.intersect(bLabels).isEmpty,
      "no cluster spans the two angular groups")
    assert(label(20L) == 20L, "the loner labels itself")
    assert(out.find(_._1 == 20L).get._3 == 1L, "loner csize is 1")
  }

  test("csize bookkeeping: sizes equal the actual label multiplicity") {
    val out = Knn.mutualKnnClusters(groups, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mult = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (v, c, sz) =>
      assert(sz == mult(c), s"vec $v cluster $c: csize $sz != ${mult(c)}")
    }
    assert(out.map(_._1).toSet == (0L to 20L).toSet)
  }

  test("LSH form with exhaustive k degenerates to the bucket partition") {
    // with ONE plane and k covering the whole fixture, the
    // bucket-restricted top-k is the entire bucket and mutuality is
    // total within it — clusters must be exactly the bucket groups
    val buckets = Knn.rpLshBuckets(groups, nPlanes = 1).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val label = Knn.mutualKnnClustersLsh(groups, nPlanes = 1, k = 21)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(label.keySet == buckets.keySet, "every vector labeled")
    for (a <- buckets.keys; b <- buckets.keys if a < b)
      assert((label(a) == label(b)) == (buckets(a) == buckets(b)),
        s"vectors $a,$b: same-cluster must equal same-bucket")
  }

  test("LSH form labels everyone once and keeps csize bookkeeping") {
    val out = Knn.mutualKnnClustersLsh(groups, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == (0L to 20L).toSet && out.length == 21)
    val mult = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (_, c, sz) => assert(sz == mult(c)) }
  }

  test("labelCentroids: tight, spread, and cancelling labels") {
    val emb = Seq(
      // label 0: four copies of (3,4) — cohesion 1, mean norm 5
      (0L, 0, Array(3.0f, 4.0f)), (1L, 0, Array(3.0f, 4.0f)),
      (2L, 0, Array(3.0f, 4.0f)), (3L, 0, Array(3.0f, 4.0f)),
      // label 1: orthogonal units — S=(1,1), each cos = 1/√2
      (4L, 1, Array(1.0f, 0.0f)), (5L, 1, Array(0.0f, 1.0f)),
      // label 2: antipodal — sum vector is 0, cohesion defined as 0
      (6L, 2, Array(1.0f, 0.0f)), (7L, 2, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.similarity.Knn.labelCentroids(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got(0) == (4L, 5.0, 1.0))
    assert(got(1) == (2L, 0.7071, 0.7071))
    assert(got(2) == (2L, 0.0, 0.0),
      "a cancelling label must report 0, not NaN")
  }

  test("cluster labels are the component minimum id") {
    val out = Knn.mutualKnnClusters(groups, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min == c,
        s"cluster $c must be labeled by its minimum member")
    }
  }
}

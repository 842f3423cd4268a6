package graft

import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch
import graft.functions.Portable.hash52

/** KMV sketch: estimator math, buffer bounds, merge laws, and the
  * property that makes it oracle-checkable — partitioning
  * independence of the exact result. */
class KmvSketchSpec extends SparkSpec {

  private val k = 64
  private def agg = new KmvSketch(k)

  test("buffer never exceeds k and stays sorted-distinct") {
    val rnd = new scala.util.Random(7)
    var b = agg.zero
    (1 to 10000).foreach(_ => b = agg.reduce(b, rnd.nextLong().abs % 100000))
    assert(b.length == k)
    assert(b.toSeq == b.toSeq.distinct.sorted)
  }

  test("below-k cardinality is exact") {
    var b = agg.zero
    (1L to 40L).foreach(h => b = agg.reduce(b, h * 31))
    (1L to 40L).foreach(h => b = agg.reduce(b, h * 31)) // duplicates
    assert(agg.finish(b) === 40.0)
  }

  test("merge is commutative and matches sequential reduce") {
    val rnd = new scala.util.Random(13)
    val xs = Array.fill(500)(rnd.nextLong().abs % 1000000)
    val (l, r) = xs.splitAt(200)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    val seq = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bl, br).toSeq == seq.toSeq)
    assert(agg.merge(br, bl).toSeq == seq.toSeq)
  }

  test("estimate is within 3 sigma on uniform hashes") {
    // ~relative error 1/sqrt(k-2) ≈ 12.7% for k=64
    val rnd = new scala.util.Random(99)
    val n = 20000
    val b = (1 to n).map(_ => math.abs(rnd.nextLong()) % (1L << 52))
      .foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(b)
    assert(math.abs(est - n) / n < 3 * 0.127, s"est=$est for n=$n")
  }

  test("distributed estimate is identical at any partitioning") {
    import spark.implicits._
    val kmv = F.udaf(agg, Encoders.scalaLong)
    def est(parts: Int): Double =
      spark.range(50000).select((F.col("id") % 9341).as("v"))
        .repartition(parts)
        .agg(kmv(hash52($"v")).as("e")).head().getDouble(0)
    val e1 = est(1)
    assert(e1 === est(16))
    assert(math.abs(e1 - 9341) / 9341 < 3 * 0.127)
  }

  test("k-min set algebra: union/Jaccard estimates track the exact values") {
    import spark.implicits._
    val mins = F.udaf(new graft.functions.KmvMins(k), Encoders.scalaLong)
    // two overlapping key sets: A = 0..5999, B = 3000..8999
    // exact: |A|=|B|=6000, |A∩B|=3000, |A∪B|=9000, J=1/3
    def side(lo: Long, hi: Long) =
      spark.range(lo, hi).agg(mins(hash52($"id")).as("m")).head()
        .getSeq[Long](0).toArray
    val ka = side(0, 6000)
    val kb = side(3000, 9000)
    // compose in Scala exactly as the query does with array built-ins
    val ku = KmvSketch.union(ka, kb, k)
    val inter = ku.count(h => ka.contains(h) && kb.contains(h))
    val jac = inter.toDouble / k
    assert(math.abs(jac - 1.0 / 3) < 0.2, s"jaccard est $jac vs 0.333")
    val unionEst = (k - 1).toDouble * KmvSketch.TwoPow52 / ku.last.toDouble
    assert(math.abs(unionEst - 9000) / 9000 < 3 * 0.127, s"union est $unionEst")
    // and the sketches are exchangeable: merging in either order agrees
    assert(KmvSketch.union(kb, ka, k).toSeq == ku.toSeq)
  }
}

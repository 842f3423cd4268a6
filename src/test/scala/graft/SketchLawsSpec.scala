package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvSketch, MisraGries, PrioritySample}
import graft.operators.BloomJoin

/** Algebraic laws of the distributed sketch kernels over many
  * seeded-random inputs — mergeability is what makes an Aggregator
  * CORRECT under any partitioning/merge tree, so these are the laws
  * the whole distributed story rests on. Pure JVM (no Spark session):
  * the kernels' reduce/merge are plain functions. */
class SketchLawsSpec extends AnyFunSuite {

  private val Trials = 200

  /** Seeded cases: (input list, split point). */
  private def cases[A](gen: scala.util.Random => A): Seq[(List[A], Int)] = {
    val rnd = new scala.util.Random(1234)
    (1 to Trials).map { _ =>
      val n = rnd.nextInt(400)
      val xs = List.fill(n)(gen(rnd))
      (xs, if (n == 0) 0 else rnd.nextInt(n + 1))
    }
  }

  test("KMV law: any split-then-merge equals the sequential reduce (exact mergeability)") {
    val agg = new KmvSketch(16)
    cases(r => math.abs(r.nextLong()) % (1L << 52)).foreach { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      assert(merged.toSeq == direct.toSeq, s"cut=$cut n=${xs.size}")
    }
  }

  test("KMV buffer invariant: the k smallest distinct inputs, sorted") {
    val agg = new KmvSketch(8)
    cases(r => r.nextLong().abs % 1000).foreach { case (xs, _) =>
      val b = xs.foldLeft(agg.zero)(agg.reduce)
      assert(b.length <= 8)
      assert(b.toSeq == xs.distinct.sorted.take(8))
    }
  }

  test("MG law: after any split-merge, err <= n/(cap+1) and every item with count > err survives") {
    val cap = 8
    val mg = new MisraGries(cap)
    // skewed alphabet: "hot" frequent, a long tail of cold items
    cases(r => if (r.nextInt(5) == 0) "hot" else s"i${r.nextInt(300)}")
      .foreach { case (xs, cut) =>
        val (a, b) = xs.splitAt(cut)
        val (keys, n, err) = mg.finish(mg.merge(
          a.foldLeft(mg.zero)(mg.reduce),
          b.foldLeft(mg.zero)(mg.reduce)))
        assert(n == xs.size)
        assert(err <= n / (cap + 1), s"err=$err n=$n")
        val counts = xs.groupBy(identity).view.mapValues(_.size).toMap
        counts.foreach { case (k, c) =>
          if (c > err) assert(keys.contains(k),
            s"item $k count=$c > err=$err missing")
        }
      }
  }

  test("PrioritySample law: split-merge equals sequential reduce") {
    val agg = new PrioritySample(12)
    cases(r => (s"id${r.nextInt(5000)}", r.nextDouble() * 1e9))
      .foreach { case (xs, cut) =>
        val (a, b) = xs.splitAt(cut)
        val merged = agg.finish(agg.merge(
          a.foldLeft(agg.zero)(agg.reduce),
          b.foldLeft(agg.zero)(agg.reduce)))
        val direct = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
        assert(merged == direct, s"cut=$cut n=${xs.size}")
      }
  }

  test("Bloom law: inserted keys always probe true (JVM-side positions)") {
    val bits = 1 << 12
    cases(r => r.alphanumeric.take(1 + r.nextInt(20)).mkString)
      .foreach { case (keys, _) =>
        val words = new Array[Long]((bits + 63) >>> 6)
        keys.foreach(k => BloomJoin.positions(k, bits, 5).foreach(p =>
          words((p >>> 6).toInt) |= 1L << (p & 63)))
        keys.foreach { k =>
          assert(BloomJoin.positions(k, bits, 5).forall(p =>
            (words((p >>> 6).toInt) >>> (p & 63) & 1L) == 1L))
        }
      }
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** ScalaCheck property tests for the algebraic contracts the scale
  * design leans on — the laws a hand-picked example can miss:
  * sketch-merge algebra (what makes partial aggregation CORRECT, not
  * just fast), z-value bijectivity (what makes file-skipping sound),
  * decimal-sum order independence (the oracle-exactness foundation),
  * and the admission-control water-fill invariants. Driver-side
  * generators; Spark evaluates batched where a kernel is a Column. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, minSuccess: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccess), p)
    assert(res.passed, s"$name: $res")
  }

  test("KMV merge is commutative, associative, idempotent, and order-blind") {
    val k = 16
    val hashes = Gen.listOf(Gen.chooseNum(0L, (1L << 52) - 1))
    def sketch(xs: Seq[Long]): Array[Long] =
      xs.foldLeft(Array.emptyLongArray)((b, h) => KmvSketch.insert(b, h, k))
    check("kmv-laws", Prop.forAll(hashes, hashes, hashes) { (a, b, c) =>
      val (sa, sb, sc) = (sketch(a), sketch(b), sketch(c))
      val comm = KmvSketch.union(sa, sb, k).sameElements(
        KmvSketch.union(sb, sa, k))
      val assoc = KmvSketch.union(KmvSketch.union(sa, sb, k), sc, k)
        .sameElements(KmvSketch.union(sa, KmvSketch.union(sb, sc, k), k))
      val idem = KmvSketch.union(sa, sa, k).sameElements(sa)
      // partial aggregation correctness: any split of the input
      // merges to the same sketch as one sequential pass
      val split = KmvSketch.union(sketch(a ++ b), sc, k)
        .sameElements(sketch(a ++ b ++ c))
      comm && assoc && idem && split
    })
  }

  test("KMV estimate is exact under k and deterministic above it") {
    val k = 16
    check("kmv-exact-small", Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, (1L << 52) - 1))) { xs =>
      val sk = new KmvSketch(k)
      val buf = xs.foldLeft(sk.zero)(sk.reduce)
      val est = sk.finish(buf)
      val nd = xs.distinct.size
      if (nd < k) est == nd.toDouble else est > 0.0
    })
  }

  test("z-value interleave is a bijection on the masked domain") {
    val bits = 16
    val pairs = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0, (1 << bits) - 1),
        Gen.chooseNum(0, (1 << bits) - 1)))
    check("zvalue-bijective", Prop.forAll(pairs) { ps =>
      if (ps.isEmpty) true
      else {
        val zs = ps.toDF("x", "y")
          .select(col("x"), col("y"),
            graft.sources.Layout.zValue(col("x"), col("y"), bits).as("z"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        zs.forall { case (x, y, z) =>
          // decode: even bit positions rebuild x, odd rebuild y
          var (dx, dy) = (0L, 0L)
          (0 until bits).foreach { i =>
            dx |= ((z >> (2 * i)) & 1L) << i
            dy |= ((z >> (2 * i + 1)) & 1L) << i
          }
          dx == x.toLong && dy == y.toLong
        }
      }
    }, minSuccess = 5) // 5 batches x 300 pairs, one Spark job each
  }

  test("native shingle kernel equals the declarative HOF formulation") {
    // the compiled 3-gram kernel (graft_shingles) claims value
    // identity with the declarative transform/concat_ws chain — the
    // property the oracle parity of every shingle-based query rests on
    // the declarative reference, inlined (Portable routes the 3-gram
    // case to the native kernel, so the reference must be spelled out)
    def declarative(toks: org.apache.spark.sql.Column) =
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
        .otherwise(array().cast("array<string>"))
    val tokArrays = Gen.listOfN(150,
      Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "ff", "longword")))
    check("shingle-kernel-parity", Prop.forAll(tokArrays) { arrays =>
      if (arrays.isEmpty) true
      else {
        val df = arrays.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "t")
        val rows = df.select(col("id"),
            call_function("graft_shingles", col("t")).as("native"),
            declarative(col("t")).as("declarative"))
          .collect()
        rows.forall { r =>
          val n = Option(r.getSeq[String](1)).getOrElse(Seq.empty)
          val d = Option(r.getSeq[String](2)).getOrElse(Seq.empty)
          n == d
        }
      }
    }, minSuccess = 5)
  }

  test("exactSum is summation-order independent where double sum is not") {
    val amounts = Gen.listOfN(200, Gen.chooseNum(-1000000L, 1000000L)
      .map(_ / 100.0))
    check("exactsum-order", Prop.forAll(amounts, Gen.long) { (xs, seed) =>
      if (xs.isEmpty) true
      else {
        val shuffled = new scala.util.Random(seed).shuffle(xs)
        def s(l: Seq[Double]): Double = l.toDF("v")
          .repartition(8) // different physical orders
          .agg(graft.functions.Portable.exactSum(col("v"), 2)).collect()(0)
          .getDouble(0)
        s(xs) == s(shuffled)
      }
    }, minSuccess = 5)
  }

}

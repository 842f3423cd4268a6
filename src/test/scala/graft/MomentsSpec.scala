package graft

import graft.operators.Relational

/** Skewness from decimal power sums: hand-computed third moments and
  * the symmetry zero. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def skewOf(vs: Seq[Double]): Double =
    Relational.skewnessByFlag(
      vs.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice"))
      .head().getDouble(2)

  test("symmetric data has zero skewness, exactly") {
    assert(skewOf(Seq(1.0, 2.0, 3.0)) == 0.0)
    assert(skewOf(Seq(-5.0, 0.0, 5.0)) == 0.0)
  }

  test("hand-computed right skew: {1,1,1,9} → 48 / (12·√12)") {
    // mean 3, m2 = 12, m3 = 48 ⇒ skew = 48/(12·√12) = √(4/3) = 1.154701
    assert(skewOf(Seq(1.0, 1.0, 1.0, 9.0)) == 1.154701)
  }

  test("mirroring the data flips the sign") {
    val s = skewOf(Seq(2.0, 3.0, 4.0, 20.0))
    val m = skewOf(Seq(-2.0, -3.0, -4.0, -20.0))
    assert(s > 0 && m == -s)
  }

  test("partitioning invariance: decimal sums don't drift") {
    val vs = (1 to 999).map(i => (i % 37) * 13.25 + (i % 11))
    val one = Relational.skewnessByFlag(
      vs.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice")
        .repartition(1)).head().getDouble(2)
    val many = Relational.skewnessByFlag(
      vs.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice")
        .repartition(13)).head().getDouble(2)
    assert(one == many)
  }
}

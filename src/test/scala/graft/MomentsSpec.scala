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

  test("regressionByFlag long-scaled fast path ≡ decimal(30,4) " +
       "reference shape, and hand-checked fit") {
    // round 11 moved the per-row arithmetic to scaled longs; the
    // epilogue's decimal 100/10⁴ divisions must recover the IDENTICAL
    // exact moments the old decimal(30,4) shape summed. Pin against
    // an inline decimal reference over 2dp data, plus a hand fit.
    import org.apache.spark.sql.functions._
    val rows = (1 to 500).map { i =>
      (if (i % 2 == 0) "A" else "R",
       (i % 47 + 1).toDouble,                     // qty: integers
       ((i % 193) * 100 + i % 100) / 100.0 * 7)   // price: 2dp
    }
    val df = rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .repartition(7)
    def dsum(c: org.apache.spark.sql.Column) = sum(c).cast("double")
    val x = col("l_quantity").cast("decimal(30,4)")
    val y = col("l_extendedprice").cast("decimal(30,4)")
    val ref = df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * y).as("sxy"), dsum(x * x).as("sxx"), dsum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n"), 4).as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
    val got = Relational.regressionByFlag(df)
    assert(got.orderBy("l_returnflag").collect().toSeq ==
           ref.orderBy("l_returnflag").collect().toSeq)
    // hand case: y = 3x + 1 exactly → slope 3, intercept 1, r² 1
    val exact = Relational.regressionByFlag(
      Seq(1.0, 2.0, 5.0, 9.0).map(v => ("A", v, 3 * v + 1))
        .toDF("l_returnflag", "l_quantity", "l_extendedprice")).head()
    assert((exact.getDouble(2), exact.getDouble(3), exact.getDouble(4)) ==
           (3.0, 1.0, 1.0))
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

  private def trimOf(vs: Seq[Double], bp: Int) =
    Relational.trimmedMeanByFlag(
        vs.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice"),
        trimBp = bp)
      .head() match { case r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)) }

  test("trimmedMeanByFlag: hand-computed 10% trim of 1..10 drops " +
       "exactly the min and max") {
    // cents 100..1000, k = 10·1000 // 10⁴ = 1 per tail → keep
    // 200..900: sum 4400 cents over 8 rows → mean_c4 = 5 500 000
    val got = trimOf((1 to 10).map(_.toDouble), bp = 1000)
    assert(got == (10L, 1L, 8L, 4400L, 5500000L), got.toString)
  }

  test("trimmedMeanByFlag: boundary ties trim by COUNT, not value — " +
       "the kept multiset is deterministic") {
    // {1,1,1,10} cents {100,100,100,1000}, 25% trim → k = 1:
    // keep ranks 2..3 = two copies of 100 (one of the three 1s is
    // trimmed; WHICH one is meaningless — values are interchangeable)
    val got = trimOf(Seq(1.0, 1.0, 1.0, 10.0), bp = 2500)
    assert(got == (4L, 1L, 2L, 200L, 1000000L), got.toString)
    // trimBp = 0 degenerates to the exact full mean
    val full = trimOf(Seq(1.0, 2.0, 4.0), bp = 0)
    assert(full == (3L, 0L, 3L, 700L, 2333333L), full.toString)
  }

  test("trimmedMeanByFlag: partitioning invariance") {
    val vs = (1 to 997).map(i => ((i % 37) * 13.25 + (i % 11), ()))
      .map(_._1)
    def run(parts: Int) = Relational.trimmedMeanByFlag(
      vs.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice")
        .repartition(parts)).head().toSeq
    assert(run(1) == run(13))
  }
}

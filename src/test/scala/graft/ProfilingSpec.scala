package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, TimeSeries}

/** Data profile + TWAP against hand-computed fixtures. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports counts, exact small-cardinality distinct, string min/max") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("b")), (4L, None))
      .toDF("id", "s")
    val got = Profiling.profile(df, Seq("id", "s")).orderBy("col_name")
      .collect()
    val id = got(0)
    assert(id.getString(0) == "id" && id.getLong(1) == 4 && id.getLong(2) == 4)
    assert(id.getDouble(3) == 4.0) // 4 distinct < k: exact by construction
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    val s = got(1)
    assert(s.getLong(1) == 4 && s.getLong(2) == 3, "null excluded from n_nonnull")
    // 2 real values + the null sentinel = 3 distinct
    assert(s.getDouble(3) == 3.0)
    assert(s.getString(4) == "a" && s.getString(5) == "b",
      "min/max ignore nulls")
  }

  test("profile reads the table exactly once regardless of column count") {
    val df = Tables.lineitem(spark, sf("sf0.001"))
    val prof = Profiling.profile(df,
      Seq("l_orderkey", "l_partkey", "l_returnflag"))
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE dumps final + initial
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single scan, got $scans:\n$plan")
  }

  test("checksum: partitioning-invariant; any single-value or null flip changes it") {
    import org.apache.spark.sql.functions._
    val base = (1 to 500).map(i => (i % 3, i.toLong, s"v$i"))
      .toDF("g", "k", "s")
    def sums(df: org.apache.spark.sql.DataFrame): Map[Int, BigDecimal] =
      Profiling.checksum(df, "g", Seq("k", "s")).collect()
        .map(r => r.getInt(0) -> BigDecimal(r.getDecimal(2))).toMap
    assert(sums(base.repartition(1)) == sums(base.repartition(7)))
    // flip one value
    val flipped = base.withColumn("s",
      when(col("k") === 250L, lit("vX")).otherwise(col("s")))
    assert(sums(base)(250 % 3) != sums(flipped)(250 % 3))
    // flip one value to NULL (sentinel must register)
    val nulled = base.withColumn("s",
      when(col("k") === 250L, lit(null: String)).otherwise(col("s")))
    assert(sums(base)(250 % 3) != sums(nulled)(250 % 3))
    // column-boundary integrity: ("ab","c") vs ("a","bc") differ
    val a = Seq((0, "ab", "c")).toDF("g", "x", "y")
    val b = Seq((0, "a", "bc")).toDF("g", "x", "y")
    assert(sums2(a) != sums2(b))
  }
  private def sums2(df: org.apache.spark.sql.DataFrame): Map[Int, BigDecimal] =
    Profiling.checksum(df, "g", Seq("x", "y")).collect()
      .map(r => r.getInt(0) -> BigDecimal(r.getDecimal(2))).toMap

  test("TWAP weights values by holding time; the last sample drops") {
    val ev = Seq(
      // user 1: v=10 held 10us, v=20 held 20us -> (100+400)/30
      (1L, 1L, 10.0, 0L), (2L, 1L, 20.0, 10L), (3L, 1L, 99.0, 30L),
      // user 2: single sample -> no weighted rows, user absent
      (4L, 2L, 5.0, 0L))
      .toDF("event_id", "user_id", "value", "ts_us")
    val got = TimeSeries.twap(ev).orderBy("user_id").collect()
    assert(got.length == 1, "single-sample users must drop out")
    assert(got(0).getLong(0) == 1L)
    assert(math.abs(got(0).getDouble(1) - 500.0 / 30) < 1e-6)
    assert(got(0).getLong(2) == 2L)
  }
}

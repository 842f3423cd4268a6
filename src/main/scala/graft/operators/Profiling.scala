package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.functions.Portable.hash52

/** Column-level data profiling — the first step of any large-scale
  * ingest: row/null counts, a bounded-state distinct estimate, and
  * lexicographic min/max per column, one summary row per profiled
  * column. At 100 TB each column's aggregate is map-side combinable
  * (counts, KMV array ≤ k longs, two strings), so the profile costs
  * one scan per column batch and the exchange stays tiny.
  *
  * Portability constraints (so the DuckDB oracle reproduces every
  * value): profile INTEGER- or STRING-typed columns — both cast to
  * identical strings in any engine, which keeps the md5-based
  * distinct hash and the min/max lexicographic order engine-exact
  * (float formatting is NOT portable; cast or round floats first).
  * NULLs fold into the sentinel below for the distinct estimate (a
  * column with nulls counts them as one extra distinct value) and
  * are excluded from min/max by SQL semantics.
  */
object Profiling {

  private val NullSentinel = "__graft_null__"

  /** Order-independent content checksum per group: row count plus the
    * exact DECIMAL(38,0) sum of each row's 52-bit content hash over
    * `cols`. Integer addition commutes, so the fingerprint is
    * identical under ANY partitioning/ordering/engine — the
    * cross-system migration check (did every row survive, unchanged?)
    * that this repo's own oracle gate is built on, packaged as an
    * operator. Map-side combinable; the exchange carries one
    * (count, decimal) pair per group. NULL columns fold into the
    * row hash via the same sentinel as [[profile]], so a value
    * flipping to NULL changes the checksum. */
  def checksum(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum: need at least one content column")
    // unit separator between columns: ("ab","c") and ("a","bc") must
    // not collide; same portability rule as profile — int/string
    // columns only (float formatting differs across engines)
    val rowHash = hash52(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit(NullSentinel))): _*))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowHash.cast("decimal(38,0)")).as("content_sum"))
  }

  def profile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val kmv = udaf(new KmvSketch(k), Encoders.scalaLong)
    // ONE scan for every column: all per-column aggregates run in a
    // single aggregation (4·|cols|+1 agg expressions), then the one
    // result row pivots to a row per column with an explode — at
    // 100 TB that's 1 pass over the table instead of |cols| passes
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nonnull_$c"),
        round(kmv(hash52(
          coalesce(col(c).cast("string"), lit(NullSentinel)))), 2)
          .as(s"__dist_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nonnull_$c").as("n_nonnull"),
        col(s"__dist_$c").as("distinct_est"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))): _*)).as("p"))
      .select(col("p.*"))
  }
}

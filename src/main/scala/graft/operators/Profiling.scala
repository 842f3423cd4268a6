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

  def profile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val kmv = udaf(new KmvSketch(k), Encoders.scalaLong)
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        round(kmv(hash52(
          coalesce(col(c).cast("string"), lit(NullSentinel)))), 2)
          .as("distinct_est"),
        min(col(c).cast("string")).as("min_str"),
        max(col(c).cast("string")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("distinct_est"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }
}

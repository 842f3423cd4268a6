package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable.hash52

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005) as a DECLARATIVE formulation: the sketch is
  * the relation `(row_i, bucket, cnt)` — one row per occupied cell of
  * the depth×width counter matrix — produced by an ordinary
  * `groupBy.count`, so Catalyst plans it with map-side partial
  * aggregation and the exchange carries at most depth×width cells per
  * partition regardless of input cardinality. No custom aggregation
  * buffer is needed: a counter matrix IS a group-by, and the
  * relational form composes (union two sketches = unionByName +
  * re-sum, a law the spec asserts).
  *
  * Hashes are the portable 52-bit md5 prefix ([[Portable.hash52]]) of
  * `"<row_i>:<item>"`, reduced mod `width` — non-negative in both
  * engines, so `%` and `pmod` agree and the DuckDB oracle reproduces
  * every cell bit-for-bit. Estimates are therefore DETERMINISTIC:
  * the correctness gate is a hash match, not a tolerance band.
  *
  * Scale posture (100 TB): the sketch itself never exceeds
  * depth×width rows, so [[estimate]] broadcasts it; candidate items
  * join against it with no shuffle of the big side. The classic
  * guarantee holds per row: est ≥ true count, and
  * est ≤ true + e/width · N with probability 1 − exp(−depth) — the
  * spec asserts the lower bound exactly and the partitioning
  * invariance of every cell.
  */
object CountMin {

  private def bucketExpr(rowI: Column, item: Column, width: Int): Column =
    pmod(hash52(concat_ws(":", rowI, item)), lit(width.toLong))

  /** Build the sketch relation `(row_i, bucket, cnt)` over one item
    * column. Cells with zero count are absent (the relation is the
    * sparse form); [[estimate]] coalesces absent cells to 0. */
  def sketch(items: DataFrame, itemCol: String,
             depth: Int = 5, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, "count-min needs depth >= 1, width >= 2")
    items
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row_i"),
        col(itemCol).as("__cms_item"))
      .select(col("row_i"),
        bucketExpr(col("row_i"), col("__cms_item"), width).as("bucket"))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[sketch]] from PRE-AGGREGATED (item, weight) rows: cell counts
    * are weight sums, mathematically identical to feeding the raw
    * stream (a counter matrix aggregates whatever lands in the cell).
    * Feeding an existing per-item aggregate instead of the raw stream
    * shrinks the sketch input from stream-sized to vocabulary-sized —
    * and when the same aggregate also feeds the exact/top-k branch of
    * a query, the plans share one exchange (AQE ReuseExchange), so
    * the underlying table is scanned ONCE. */
  def sketchWeighted(counts: DataFrame, itemCol: String, weightCol: String,
                     depth: Int = 5, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, "count-min needs depth >= 1, width >= 2")
    counts
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row_i"),
        col(itemCol).as("__cms_item"), col(weightCol).as("__cms_w"))
      .select(col("row_i"),
        bucketExpr(col("row_i"), col("__cms_item"), width).as("bucket"),
        col("__cms_w"))
      .groupBy("row_i", "bucket")
      .agg(sum("__cms_w").as("cnt"))
  }

  /** Point-estimate the count of each `candidates` row's `itemCol`:
    * min over the depth rows of the matching cell. `sk` is tiny
    * (≤ depth×width rows) and is broadcast — the only shuffle is the
    * candidates' own final group-by, keyed on the candidate item. */
  def estimate(sk: DataFrame, candidates: DataFrame, itemCol: String,
               depth: Int = 5, width: Int = 512): DataFrame = {
    val cand = candidates
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1))).as("row_i"))
      .withColumn("bucket", bucketExpr(col("row_i"), col(itemCol), width))
    cand.join(broadcast(sk), Seq("row_i", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}

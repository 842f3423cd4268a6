package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-bin histogram sketch: the bounded-state, MERGEABLE quantile
  * estimator next to the exact `percentile` aggregate (full sort,
  * unbounded state) and the deterministic-sample quantiles
  * (`sample_quantiles`, bounded but not mergeable).
  *
  * The sketch is the relation (bin, cnt) with bin = floor(v/width) —
  * an ordinary groupBy, so it is map-side combinable, additive under
  * union (same argument as [[CountMin]]), and its size is bounded by
  * the value RANGE over the bin width, independent of row count. A
  * quantile estimate is the upper edge of the first bin whose
  * cumulative count reaches ceil(q·n): a deterministic rule with
  * error ≤ one bin width, reproducible bit-for-bit in any engine —
  * no interpolation, no float accumulation (counts are longs; the
  * only float op is the final edge multiply).
  *
  * Scale posture (100 TB): the histogram exchange carries bins, not
  * rows; the quantile pass is a window cumsum over the bin table
  * (range-sized, tiny). At petabyte row counts this answers p50/p99
  * in one scan + one bin-table pass where exact percentile would
  * sort-shuffle every value. */
object HistogramSketch {

  /** Build the (bin, cnt) histogram of `valueCol` at `binWidth`. */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "histogram: binWidth must be positive")
    df.select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Per-group histogram: one (group, bin, cnt) relation — the same
    * bounded sketch keyed by `groupCols`, for grouped quantiles. */
  def histogramBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  binWidth: Double): DataFrame = {
    require(binWidth > 0, "histogram: binWidth must be positive")
    require(groupCols.nonEmpty, "histogramBy: need at least one group column")
    df.select(groupCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("bin"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "bin": _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Grouped [[quantiles]]: per group, the same first-bin-reaching-
    * ceil(q·n) rule, with the cumsum window PARTITIONED by the group
    * (each partition is one group's bin table — still range-sized).
    * Returns (groupCols..., q, n, est). */
  def quantilesBy(hist: DataFrame, groupCols: Seq[String],
                  qs: Seq[Double], binWidth: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles: each q must be in (0, 1]")
    val spark = hist.sparkSession
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(gcols: _*).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(Window.partitionBy(gcols: _*)))
    val qDf = spark.createDataFrame(qs.map(q => Tuple1(q))).toDF("q")
    cum.crossJoin(broadcast(qDf))
      .where(col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy(gcols :+ col("q") :+ col("n"): _*)
      .agg(min("bin").as("__qbin"))
      .select(gcols ++ Seq(col("q"), col("n"),
        ((col("__qbin") + 1).cast("double") * binWidth).as("est")): _*)
  }

  /** Estimate quantiles `qs` (each in (0, 1]) from a histogram:
    * per q, the upper edge of the first bin whose cumulative count
    * reaches ceil(q·n). Returns (q, n, est) rows. */
  def quantiles(hist: DataFrame, qs: Seq[Double], binWidth: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles: each q must be in (0, 1]")
    val spark = hist.sparkSession
    import org.apache.spark.sql.expressions.Window
    // cumulative counts over the bin table — range-sized, so the
    // unpartitioned window is a non-issue by construction
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(hist.agg(sum("cnt").as("n")))) // 1-row side
    val qDf = spark.createDataFrame(
      qs.map(q => Tuple1(q))).toDF("q")
    cum.crossJoin(broadcast(qDf))
      .where(col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy(col("q"), col("n"))
      .agg(min("bin").as("__qbin"))
      .select(col("q"), col("n"),
        ((col("__qbin") + 1).cast("double") * binWidth).as("est"))
  }
}

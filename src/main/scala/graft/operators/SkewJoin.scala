package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Layout

/** Query surface for the salted (skew-spread) equi-join.
  *
  * The mechanism lives in [[Layout.saltedJoin]] (physical-layout
  * concern: spread a hot key across `saltFactor` reducers by salting
  * the skewed side and replicating the other). This object owns the
  * CONTRACT demonstration: salting changes distribution, never the
  * result — the `join_salted` oracle in SparkEntry is the PLAIN
  * unsalted join, and the hash-match is the proof.
  *
  * When to salt: large⋈medium joins where the medium side is too big
  * to broadcast but `saltFactor`× it still shuffles cheaply, and hash
  * aggregations AQE's sort-merge-only skew split can't fix. For
  * large⋈small, `broadcast()` already avoids the shuffle and needs no
  * salt.
  */
object SkewJoin {

  /** lineitem ⋈ orders via HOT-KEY-ONLY salting, then revenue per
    * order priority — the aggregate erases the salt, so the result
    * must be bit-identical to the plain join (the oracle IS the
    * unsalted join). `minHotCount = 1000` is the production posture:
    * far above TPC-H's uniform 1–7 lines per order, so on unskewed
    * data the ENTIRE join takes the plain cold path and the only
    * overhead is the (map-side-combinable) key histogram — replication
    * is paid exactly when a key is genuinely hot. A soak with
    * minHotCount=5 measured the alternative: classifying ~40% of
    * uniform keys "hot" re-replicates most of the fact side and costs
    * 5.6× at 10× data, precisely the failure the threshold exists to
    * avoid. The hot path's row-level behavior is exercised by
    * SkewJoinSpec on synthetic 90%-one-key data. Decimal-exact
    * revenue per Portable convention. */
  def revenueByPrioritySalted(lineitem: DataFrame, orders: DataFrame,
                              nSalts: Int = 8): DataFrame =
    Layout.saltedJoinHot(
      lineitem.select(col("l_orderkey"), col("l_extendedprice"),
        col("l_discount")),
      orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority")),
      key = "l_orderkey", saltFactor = nSalts, minHotCount = 1000L)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        Portable.exactSumProd(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("revenue"))
}

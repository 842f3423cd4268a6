package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Salted (skew-spread) equi-join.
  *
  * When one join key carries a disproportionate share of the rows, a
  * plain shuffle hash/sort-merge join lands that key's entire volume
  * on ONE reducer — at 100 TB a single hot key (the empty user-agent,
  * the null-ish default id, the one viral document) straggles the
  * whole stage. AQE's skew-join splitting (`spark.sql.adaptive.
  * skewJoin.enabled`) handles sort-merge joins at runtime; salting is
  * the PLAN-LEVEL fix that also covers hash aggregation and works on
  * any join the optimizer picks:
  *
  *   - the SKEWED side gets a pseudo-random salt in [0, n) per row;
  *   - the other side is replicated n times (explode of a literal
  *     sequence), once per salt value;
  *   - the join runs on (key, salt) — the hot key now spreads over n
  *     reducers; the result multiset is IDENTICAL to the unsalted
  *     join because each skewed row matches exactly the one replica
  *     carrying its salt.
  *
  * Correctness does NOT depend on the salt function (any row→[0,n)
  * assignment works), so the salt uses Spark's native `hash` (fast,
  * codegen'd) rather than a portable digest — the oracle equality in
  * SparkEntry (`join_salted` vs the plain-join SQL) is exactly the
  * point: same result, different physical distribution.
  *
  * Replication cost: n× the small side. Use for large⋈medium where
  * the medium side is too big to broadcast but n× it is still cheap
  * to shuffle; for large⋈small, `broadcast()` already avoids the
  * shuffle entirely and needs no salt.
  */
object SkewJoin {

  /** Inner-join `skewed` with `other` on `skewed(key) === other(key)`,
    * spreading each key over `nSalts` reducers. Output columns =
    * skewed's then other's (key column kept once, from the skewed
    * side), like a plain `join(..., Seq(key))`. `saltOn` picks the
    * per-row salt input on the skewed side; it defaults to every
    * column (maximum spread) and only affects distribution, never the
    * result. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 nSalts: Int = 8, saltOn: Seq[Column] = Nil): DataFrame = {
    require(nSalts >= 1, "nSalts must be >= 1")
    val saltSrc = if (saltOn.nonEmpty) saltOn
                  else skewed.columns.toSeq.map(col)
    val l = skewed.withColumn("_graft_salt",
      pmod(hash(saltSrc: _*), lit(nSalts)))
    val r = other.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumnRenamed(key, "_graft_rkey")
    l.join(r,
        l("_graft_salt") === r("_graft_salt") &&
          col(key) === col("_graft_rkey"))
      .drop("_graft_salt").drop("_graft_rkey")
  }

  /** The shipped demonstration: lineitem ⋈ orders on l_orderkey =
    * o_orderkey through the salt, then revenue per order priority —
    * the aggregate erases the salt, so the oracle is the plain join.
    * Decimal-exact revenue per Portable convention. */
  def revenueByPrioritySalted(lineitem: DataFrame, orders: DataFrame,
                              nSalts: Int = 8): DataFrame =
    saltedJoin(
      lineitem.select(col("l_orderkey"), col("l_extendedprice"),
        col("l_discount")),
      orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority")),
      key = "l_orderkey", nSalts = nSalts)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        Portable.exactSumProd(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("revenue"))
}

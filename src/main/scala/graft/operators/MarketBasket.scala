package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the pair-counting prep behind
  * item-item collaborative filtering and association-rule mining
  * (Agrawal & Srikant's support/confidence frame, VLDB 1994; lift as
  * the interest measure).
  *
  * The scale discipline is the SAME as the dedup pair expanders: all
  * pair volume is basket-bounded. Baskets larger than `maxBasket`
  * are dropped BEFORE the self-join (the standard practice — a
  * degenerate "basket" is a crawler or a bug, and its pair count is
  * quadratic garbage), so expansion is ≤ maxBasket²/2 per basket and
  * the join is an equi-join on the basket key that AQE can split.
  * Item marginals and the basket total are side aggregates (item- and
  * 1-sized); every rule metric is rational arithmetic off exact
  * counts — support, confidence, and lift all hash-match the oracle. */
object MarketBasket {

  /** Top co-occurring item pairs with rule metrics. `items` must have
    * (basket, item) columns — pass e.g. lineitem's (l_orderkey,
    * l_partkey). Output per pair (item1 < item2): pair_n, n1, n2,
    * support8 = pair_n/baskets, conf8 = pair_n/n1 (the 1→2 rule),
    * lift8 = pair_n·baskets/(n1·n2), top `top` by (pair_n desc,
    * item1, item2). */
  def pairRules(items: DataFrame, basket: Column, item: Column,
                maxBasket: Int = 64, top: Int = 20,
                preGate: Boolean = false): DataFrame = {
    require(maxBasket >= 2, "maxBasket must allow pairs")
    // ONE basket-keyed exchange: collect_set dedupes in the aggregate,
    // the size gate drops degenerate baskets before any pair exists,
    // and pairs expand IN-BASKET from the sorted array (the same
    // in-cell expansion shape as Dedup's LSH pair miners) — no window
    // pass, no self-join.
    //
    // CAVEAT: the gate runs on the COLLECTED set, so a pathological
    // basket (a crawler session with millions of items) is still
    // built in one aggregation buffer before being dropped. For
    // corpora where that can happen, `preGate = true` spends one
    // extra (bk)-keyed counting aggregate to drop oversize baskets
    // BEFORE anything collects — the memory-safe path, at one more
    // exchange of (bk, n) pairs.
    val gated =
      if (!preGate) items
      else {
        val sizes = items.select(basket.as("_graft_bk"), item.as("it"))
          .distinct()
          .groupBy(col("_graft_bk")).agg(count(lit(1)).as("_bs"))
          .filter(col("_bs") <= maxBasket)
          .select(col("_graft_bk"))
        // left-semi on the surviving keys: that key set can be nearly
        // basket-cardinality-sized, so it shuffles — never broadcasts
        items.join(sizes, basket === col("_graft_bk"), "left_semi")
      }
    val baskets = gated
      .groupBy(basket.as("bk"))
      .agg(sort_array(collect_set(item)).as("its"))
      .filter(size(col("its")) <= maxBasket)
    val pairExprs = explode(flatten(transform(col("its"),
      (x, i) => transform(
        slice(col("its"), i + lit(2), size(col("its"))),
        y => struct(x.as("item1"), y.as("item2"))))))
    val pairs = baskets
      .select(pairExprs.as("p"))
      .groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
      .agg(count(lit(1)).as("pair_n"))
    val marginals = baskets
      .select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n"))
    val totals = baskets.agg(count(lit(1)).as("baskets"))
    pairs
      .join(marginals.select(col("it").as("item1"), col("n").as("n1")),
        "item1")
      .join(marginals.select(col("it").as("item2"), col("n").as("n2")),
        "item2")
      .crossJoin(broadcast(totals))
      .select(col("item1"), col("item2"), col("pair_n"), col("n1"),
        col("n2"),
        round(col("pair_n").cast("double") / col("baskets"), 8)
          .as("support8"),
        round(col("pair_n").cast("double") / col("n1"), 8).as("conf8"),
        round(col("pair_n").cast("double") * col("baskets") /
          (col("n1") * col("n2")), 8).as("lift8"))
      .orderBy(col("pair_n").desc, col("item1"), col("item2"))
      .limit(top)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture primitives for snapshot-based ingest: diff two
  * keyed snapshots into an I/U/D change set, and apply a change set
  * to a slowly-changing-dimension (SCD type 2) history table.
  *
  * Scale posture (100 TB): [[snapshotDiff]] is ONE key-partitioned
  * full-outer join — the minimal plan for a diff; both sides shuffle
  * once on the key and AQE picks sort-merge vs broadcast from actual
  * sizes. Watched columns travel as a single struct, so adding
  * columns widens the row but never adds joins. [[scd2Apply]] joins
  * the (small) change set against only the OPEN slice of the history
  * table: closed versions stream through untouched with no join at
  * all, so cost is proportional to the live dimension + change batch,
  * not to accumulated history.
  */
object Cdc {

  /** Diff `newDf` against `oldDf` on `keys`, watching `watch` columns.
    * Returns one row per changed key: the keys, `change_type`
    * ('I'nsert | 'U'pdate | 'D'elete), and `old_<c>` / `new_<c>` for
    * every watched column (null on the absent side of an I/D).
    * Unchanged keys (null-safe equality over ALL watched columns) are
    * dropped. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], watch: Seq[String]): DataFrame = {
    require(keys.nonEmpty && watch.nonEmpty, "cdc: keys and watch must be non-empty")
    val o = oldDf.select(keys.map(col) :+ struct(watch.map(col): _*).as("__old"): _*)
    val n = newDf.select(keys.map(col) :+ struct(watch.map(col): _*).as("__new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, lit("I"))
          .when(col("__new").isNull, lit("D"))
          .when(!(col("__old") <=> col("__new")), lit("U")))
      .where(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        watch.map(c => col(s"__old.$c").as(s"old_$c")) ++
        watch.map(c => col(s"__new.$c").as(s"new_$c")): _*)
  }

  /** Apply a [[snapshotDiff]]-shaped change set to an SCD2 history
    * table at version time `ts`. `dim` carries `watch` plus
    * `valid_from`/`valid_to` (BIGINT version stamps; open = null
    * valid_to). Per change: U/D close the open version at `ts`; I/U
    * open a new version (`new_<c>` values, valid_from = ts). Closed
    * history rows and untouched open rows pass through unchanged.
    *
    * PRECONDITION: `changes` has at most one row per key — true by
    * construction for [[snapshotDiff]] output (a full-outer join on
    * the keys). A hand-built change set with duplicate keys would
    * silently fan out the open rows it joins. */
  def scd2Apply(dim: DataFrame, changes: DataFrame,
                keys: Seq[String], watch: Seq[String], ts: Long): DataFrame = {
    val closed = dim.where(col("valid_to").isNotNull)
    val open = dim.where(col("valid_to").isNull)
    val byKey = changes.select(
      keys.map(col) :+ col("change_type") :+
        struct(watch.map(c => col(s"new_$c").as(c)): _*).as("__new"): _*)
    // close the open version of every touched key (U and D alike)
    val openAfter = open.join(byKey.select(keys.map(col) :+ col("change_type"): _*),
        keys, "left")
      .withColumn("valid_to",
        when(col("change_type").isin("U", "D"), lit(ts))
          .otherwise(col("valid_to")))
      .drop("change_type")
    // open a fresh version for every I and U
    val opened = byKey.where(col("change_type").isin("I", "U"))
      .select(keys.map(col) ++ watch.map(c => col(s"__new.$c").as(c)): _*)
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("bigint"))
    closed.unionByName(openAfter).unionByName(opened)
  }

  /** Maintainable per-group aggregate STATE: (group, cnt, total) with
    * the total in DECIMAL — exact and order-independent, so folding
    * deltas in later ([[aggDelta]]) is associative with no float
    * drift. This is the materialized-view shape; round/cast `total`
    * at the read edge, never in the state. */
  def groupAggState(df: DataFrame, groupCol: String,
                    measureCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("cnt"),
      sum(col(measureCol).cast("decimal(18,4)")).as("total"))

  /** Incremental view maintenance for the [[groupAggState]] shape:
    * fold a [[snapshotDiff]] change set into the prior state WITHOUT
    * touching the fact table. Each change emits retraction and/or
    * addition deltas — D retracts (−1, −old) at the old group, I adds
    * (+1, +new) at the new group, U does both (the row may MOVE
    * groups) — and one re-aggregate merges them with the prior rows.
    * Groups whose count reaches zero drop out entirely.
    *
    * The maintained invariant (the oracle's contract): fold(prior,
    * diff(old, new)) equals the from-scratch aggregate over `new`,
    * exactly — DECIMAL addition is order-independent, so the folded
    * total is bit-identical to the recomputed one.
    *
    * Scale posture: the fold's cost is |state| + |changes| — one
    * union, one group-key exchange — while the recompute it replaces
    * scans the full fact table. At 100 TB with a daily 0.1% delta
    * that is the difference between touching 100 GB and 100 TB. */
  /** Maintainable per-group TOP-K state: the k best rows per group by
    * (`valueCol` desc, `idCol` asc — the id tiebreak makes the state
    * deterministic under any partitioning). Columns out: group,
    * `rnk` (1..k), id, value. Bounded state: k rows per group, ever.
    * The per-group window prunes to k via InferWindowGroupLimit, so
    * building state over a fact table is one exchange + a group-limit
    * window, never a full sort. */
  def topkState(df: DataFrame, groupCol: String, valueCol: String,
                idCol: String, k: Int): DataFrame = {
    require(k > 0, "cdc: need k > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc, col(idCol).asc)
    df.select(col(groupCol), col(valueCol), col(idCol))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("rnk"), col(idCol), col(valueCol))
  }

  /** Incremental top-k maintenance for INSERT-ONLY feeds — the third
    * IVM member next to [[aggDelta]] (additive aggregates) and
    * `GraphOps.componentsDelta` (fixpoint labels): fold a batch of
    * inserted rows into a prior [[topkState]] without touching the
    * fact table. Exactness is the merge law max-based top-k enjoys
    * under inserts: every old row of topk(old ∪ Δ) ranks at least as
    * well within `old` alone, so it is already IN the prior state —
    * `topk(state ∪ topk(Δ)) = topk(old ∪ Δ)`, bit-for-bit (the
    * from-scratch recompute IS the oracle's contract, as for
    * aggDelta). Deletes are deliberately out of scope: a delete can
    * promote a row the bounded state no longer holds, which is why
    * delete-capable engines keep k′ > k shadow rows — documented
    * here rather than silently mishandled (inserts-only is the
    * append-only-log case the streaming front door actually has).
    *
    * Cost: |state| + |Δ| through one union and one group-limit
    * window — k rows per group in, k out, while the recompute scans
    * the full fact table. */
  def topkDelta(state: DataFrame, inserts: DataFrame, groupCol: String,
                valueCol: String, idCol: String, k: Int): DataFrame =
    topkState(
      state.select(col(groupCol), col(idCol), col(valueCol))
        .unionByName(topkState(inserts, groupCol, valueCol, idCol, k)
          .select(col(groupCol), col(idCol), col(valueCol))),
      groupCol, valueCol, idCol, k)

  def aggDelta(prior: DataFrame, changes: DataFrame,
               groupCol: String, measureCol: String): DataFrame = {
    val retract = changes.filter(col("change_type").isin("D", "U"))
      .select(col(s"old_$groupCol").as(groupCol),
        lit(-1L).as("cnt"),
        (-col(s"old_$measureCol")).cast("decimal(18,4)").as("total"))
    val add = changes.filter(col("change_type").isin("I", "U"))
      .select(col(s"new_$groupCol").as(groupCol),
        lit(1L).as("cnt"),
        col(s"new_$measureCol").cast("decimal(18,4)").as("total"))
    prior.unionByName(retract).unionByName(add)
      .groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
      .filter(col("cnt") > 0)
  }
}

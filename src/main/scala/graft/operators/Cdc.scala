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
    * aggDelta). Deletes are out of scope HERE because a delete can
    * promote a row the bounded state no longer holds — the
    * delete-capable variant is [[topkShadowState]]/[[topkFold]],
    * which keeps k′ > k shadow rows and reports (never silently
    * mishandles) the groups whose deletion budget is exceeded
    * (inserts-only remains the append-only-log case the streaming
    * front door actually has).
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

  /** Delete-capable TOP-K shadow state: `kPrime > k` rows per group
    * by (`valueCol` desc, `idCol` asc), plus a per-group `truncated`
    * flag — true iff the group had MORE than `kPrime` rows, i.e. the
    * state does NOT hold the whole group and rows exist below the
    * shadow horizon. The flag is what makes deletes decidable: a
    * non-truncated group answers any delete exactly (the state IS
    * the group), a truncated one has a per-cycle budget of
    * `kPrime − k` deletions before the top-k can no longer be proven
    * (see [[topkFold]] / [[topkRefill]]).
    *
    * Plan shape: the `kPrime + 1` rank filter rides the same
    * group-limit window pushdown as [[topkState]] (never a full
    * sort); the `truncated` derivation is a second window over the
    * ALREADY-PRUNED ≤ kPrime+1 rows per group — same partitioning,
    * no extra exchange. */
  def topkShadowState(df: DataFrame, groupCol: String, valueCol: String,
                      idCol: String, k: Int, kPrime: Int): DataFrame = {
    require(k > 0 && kPrime > k, "cdc: need kPrime > k > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc, col(idCol).asc)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol), col(idCol))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kPrime + 1)
      .withColumn("truncated", max(col("rnk")).over(wg) === kPrime + 1)
      .filter(col("rnk") <= kPrime)
      .select(col(groupCol), col("rnk"), col(idCol), col(valueCol),
        col("truncated"))
  }

  /** Fold a batch of INSERTS and DELETES into a [[topkShadowState]]
    * without touching the fact table — the delete-capable variant
    * [[topkDelta]]'s Scaladoc promises. Deletes are an id set
    * (`deletes.select(idCol)`) over PRE-EXISTING facts; ids absent
    * from the state are no-ops (a deleted fact row below the shadow
    * horizon cannot affect the held rows). An id that appears in
    * BOTH sides of one batch folds as inserted — deletes never
    * target same-batch inserts, so insert+delete of the same id is
    * an upsert, exactly how the post-batch fact table
    * `(facts ∖ deletes) ∪ inserts` reads it (the [[topkRepair]]
    * fixture, the `cdc_topk_delete` oracle, and the spec's
    * recompute all apply deletes to prior facts only).
    *
    * Exactness envelope, per group: if the group is NOT truncated the
    * state is the whole group and any delete/insert mix folds
    * exactly. If it IS truncated, the `kPrime` held rows outrank
    * every unheld row, so as long as at least `k` of them survive
    * the batch's deletes the true top-k of the post-batch facts is
    * among survivors ∪ inserts — exact again. Only a truncated group
    * whose survivors fall below `k` (i.e. more than `kPrime − k`
    * state deletions) can hide a promotable unheld row; that group
    * gets `needs_refill = true` — the REPORTED signal that the
    * bounded state cannot serve the group and a rebuild from facts
    * is owed — rather than a silently under-filled or wrong top-k.
    *
    * Output: (group, rnk 1..kPrime, id, value, truncated,
    * needs_refill); serve the view as `rnk <= k` on the
    * `!needs_refill` groups. `truncated` is maintained conservatively
    * (old side ∨ insert side ∨ the union re-overflowing kPrime ∨
    * needs_refill), so a later fold never trusts state a refill
    * already invalidated. A group whose rows are ALL deleted
    * vanishes from this frame — [[topkRefill]] still reports it,
    * which is why the refill report is its own method over the
    * PRE-fold state.
    *
    * Cost: |state| + |Δ| — the delete mark is one id-keyed join
    * (ids only cross the wire, never fact rows), insert ranking is
    * the same group-limit window as state building, and the final
    * re-rank runs over ≤ 2·kPrime rows per group. */
  def topkFold(state: DataFrame, inserts: DataFrame, deletes: DataFrame,
               groupCol: String, valueCol: String, idCol: String,
               k: Int, kPrime: Int): DataFrame = {
    require(k > 0 && kPrime > k, "cdc: need kPrime > k > 0")
    val delIds = deletes.select(col(idCol)).distinct()
    val marked = state.join(delIds.withColumn("__del", lit(true)),
      Seq(idCol), "left")
    val refill = marked.groupBy(col(groupCol))
      .agg((bool_or(col("truncated")) &&
        (count(lit(1)) - count(col("__del"))) < k).as("needs_refill"))
    val survivors = marked.filter(col("__del").isNull)
      .select(col(groupCol), col(idCol), col(valueCol),
        col("truncated").as("side_trunc"))
    val insTop = topkShadowState(inserts, groupCol, valueCol, idCol,
        k, kPrime)
      .select(col(groupCol), col(idCol), col(valueCol),
        col("truncated").as("side_trunc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).desc, col(idCol).asc)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    survivors.unionByName(insTop)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kPrime + 1)
      .withColumn("truncated",
        bool_or(col("side_trunc")).over(wg) ||
          max(col("rnk")).over(wg) === kPrime + 1)
      .filter(col("rnk") <= kPrime)
      .join(refill, Seq(groupCol), "left")
      .withColumn("needs_refill", coalesce(col("needs_refill"), lit(false)))
      .withColumn("truncated", col("truncated") || col("needs_refill"))
      .select(col(groupCol), col("rnk"), col(idCol), col(valueCol),
        col("truncated"), col("needs_refill"))
  }

  /** The refill report for a delete batch against a
    * [[topkShadowState]]: one row per group whose post-delete
    * survivors fall below `k` on a truncated group — the groups
    * [[topkFold]] flags (including groups the deletes WIPE entirely,
    * which have no surviving row to carry the flag). `held` /
    * `deleted` quantify the damage: the group held `held` shadow
    * rows and lost `deleted` of them this batch. */
  def topkRefill(state: DataFrame, deletes: DataFrame,
                 groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "cdc: need k > 0")
    val delIds = deletes.select(col(idCol)).distinct()
    state.join(delIds.withColumn("__del", lit(true)), Seq(idCol), "left")
      .groupBy(col(groupCol))
      .agg(bool_or(col("truncated")).as("was_truncated"),
        count(lit(1)).as("held"),
        count(col("__del")).as("deleted"))
      .filter(col("was_truncated") && (col("held") - col("deleted")) < k)
      .select(col(groupCol), col("held"), col("deleted"))
  }

  /** The refill signal CONSUMED: rebuild the flagged groups from the
    * (post-batch) fact table and merge with the healthy groups'
    * folded state — the repair action [[topkFold]]'s report demands.
    * `refill` is [[topkRefill]]'s output (computed on the PRE-fold
    * state, so it includes groups the batch wiped entirely — the
    * folded frame alone couldn't name those); `facts` is the fact
    * table AFTER the batch (deletes applied, inserts present).
    *
    * Cost model — the whole point of the signal: the fact scan is
    * FILTERED to the refill groups (a broadcast semi-join the scan's
    * group predicate can prune on), so the repair touches
    * |refill groups| worth of facts, not the table; healthy groups
    * keep their folded k′-shadow untouched. After repair the served
    * top-k is exact for EVERY group again (healthy by the fold's
    * budget law, rebuilt by construction) — the contract the
    * `cdc_topk_repair` oracle checks with no group restriction. */
  def topkRepair(folded: DataFrame, refill: DataFrame, facts: DataFrame,
                 groupCol: String, valueCol: String, idCol: String,
                 k: Int, kPrime: Int): DataFrame = {
    val bad = refill.select(col(groupCol)).distinct()
    val healthy = folded.filter(!col("needs_refill"))
      .join(broadcast(bad), Seq(groupCol), "left_anti")
      .select(col(groupCol), col("rnk"), col(idCol), col(valueCol),
        col("truncated"))
    val rebuilt = topkShadowState(
      facts.join(broadcast(bad), Seq(groupCol), "left_semi"),
      groupCol, valueCol, idCol, k, kPrime)
    healthy.unionByName(rebuilt)
      .withColumn("needs_refill", lit(false))
  }

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

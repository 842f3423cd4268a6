package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion propagation — the right-to-be-forgotten audit a training
  * corpus owes its sources: given a forget-set of document ids, report
  * how many rows each artifact (the corpus AND everything derived from
  * it — chunks, the embedding store) sheds, in one call.
  *
  * The operative scale fact: forget-sets are small (a takedown batch,
  * one crawl domain) while artifacts are the 100 TB side — so the
  * forget-set BROADCASTS and each artifact is audited in a single scan
  * with a conditional-sum aggregate (no anti-join materialization, no
  * second pass for the "before" count). Executing the deletion is then
  * `artifact.join(ids, "left_anti")` per artifact; this report is the
  * cheap dry-run/receipt around it.
  */
object Forget {

  /** One audit row per artifact: (artifact, rows_before, rows_removed,
    * rows_after). Each artifact pairs with the name of its id column
    * (`doc_id` for corpus artifacts, `vec_id` for the vector store).
    * `forgetIds` must have a `doc_id` column. */
  def report(artifacts: Seq[(String, DataFrame, String)],
             forgetIds: DataFrame): DataFrame = {
    require(artifacts.nonEmpty, "need at least one artifact")
    // working columns are namespaced and checked — a silent collision
    // with an artifact column would corrupt the audit (cf. the
    // RangeJoin '_bin' lesson)
    val fid = "_graft_forget_id"
    artifacts.foreach { case (name, df, _) =>
      require(!df.columns.contains(fid),
        s"artifact '$name' already has a $fid column")
    }
    val ids = broadcast(
      forgetIds.select(col("doc_id").as(fid)).distinct())
    artifacts.map { case (name, df, idCol) =>
      df.join(ids, col(idCol) === col(fid), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          sum(when(col(fid).isNotNull, 1L).otherwise(0L))
            .as("rows_removed"))
        .select(
          lit(name).as("artifact"),
          col("rows_before"),
          col("rows_removed"),
          (col("rows_before") - col("rows_removed")).as("rows_after"))
    }.reduce(_ unionByName _)
  }

  /** The shipped audit: forget-set = doc_id ≡ 0 (mod 97) (a
    * deterministic stand-in for a takedown batch), propagated over the
    * corpus, its derived chunk table, and the id-aligned embedding
    * store. */
  def corpusAudit(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val ids = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id"))
    report(
      Seq(
        ("chunks", graft.text.TextAnalysis.chunk(docs), "doc_id"),
        ("documents", docs, "doc_id"),
        ("embeddings", embeddings, "vec_id")),
      ids)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Double-run determinism check over the FULL query surface — the
  * committed tool behind ARCHITECTURE's "every query is double-run
  * deterministic" claim (previously verified ad hoc per round).
  *
  * Method: run each query twice, tag each run, and compare PER-RUN
  * multiplicities per distinct row with one aggregate per query — no
  * driver-side collect of result rows. (The earlier even-total-count
  * test could false-negative: a row appearing twice in run A and
  * zero times in run B totals an even 2 and passed; separate per-run
  * counts make the check exact multiset equality.) Rows key by
  * `to_json(struct(*))`, which is stable because both runs compute
  * the same deterministic values in the same column order.
  *
  * Usage: runMain graft.DetCheck [sfDir]
  * Prints one line per query and a final summary; exits nonzero on
  * any mismatch or error.
  */
object DetCheck {

  /** Number of distinct rows whose run-A and run-B multiplicities
    * differ — 0 iff the two results are equal as MULTISETS. Exposed
    * (not inlined in main) so the 2-vs-0 false-negative of the old
    * even-total-count test is itself spec-pinned. */
  def multisetDiff(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Long = {
    val key = (df: org.apache.spark.sql.DataFrame, run: Int) =>
      df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("k"),
        lit(run).as("r"))
    key(a, 0).unionByName(key(b, 1))
      .groupBy(col("k")).agg(
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("r") === 1, 1L).otherwise(0L)).as("cb"))
      .filter(col("ca") =!= col("cb"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    var bad = 0
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val a = SparkEntry.queries(n)(spark, dir)
        val b = SparkEntry.queries(n)(spark, dir)
        val diff = multisetDiff(a, b)
        if (diff == 0L) println(s"[det] OK       $n")
        else { bad += 1; println(s"[det] MISMATCH $n ($diff differing-multiplicity rows)") }
      } catch {
        case e: Exception =>
          bad += 1
          println(s"[det] ERROR    $n: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}")
      }
    }
    println(s"[det] ${names.size - bad}/${names.size} deterministic")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

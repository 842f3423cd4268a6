package graft

import org.apache.spark.sql.functions._

/** Double-run determinism check over the FULL query surface — the
  * committed tool behind ARCHITECTURE's "every query is double-run
  * deterministic" claim (previously verified ad hoc per round).
  *
  * Method: run each query twice and union the two result sets; a
  * query is deterministic iff every row appears an EVEN number of
  * times (equal multisets ⟺ all group counts even), checked with one
  * aggregate per query — no driver-side collect of result rows. Rows
  * key by `to_json(struct(*))`, which is stable because both runs
  * compute the same deterministic values in the same column order.
  *
  * Usage: runMain graft.DetCheck [sfDir]
  * Prints one line per query and a final summary; exits nonzero on
  * any mismatch or error.
  */
object DetCheck {

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
        val key = (df: org.apache.spark.sql.DataFrame) =>
          df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("k"))
        val odd = key(a).unionByName(key(b))
          .groupBy(col("k")).agg(count(lit(1)).as("c"))
          .filter(col("c") % 2 =!= 0)
          .count()
        if (odd == 0L) println(s"[det] OK       $n")
        else { bad += 1; println(s"[det] MISMATCH $n ($odd odd-count rows)") }
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

package graft

/** Interleaved single-JVM re-measurement of named SparkEntry queries —
  * the tool for pinning an apparent cross-session bench regression as
  * noise or as real (the repo's measurement rule: the machine drifts
  * up to ~1.5× between sessions, so cross-session deltas mean nothing
  * until the queries alternate inside ONE session; min over ≥3 reps
  * is the statistic).
  *
  * Usage: runMain graft.AbQueries <sfDir> <reps> <q1,q2,...>
  */
object AbQueries {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(names.nonEmpty, "pass a comma-separated query list")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    // one warm pass at the smallest scale: codegen/JIT, not data
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; n <- names) {
      // drain dead localCheckpoint blocks before each timed rep (the
      // Soak.timeIn hygiene) — iterative queries otherwise accumulate
      // storage-pool squatters across reps
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(n) = dt :: times.getOrElse(n, Nil)
      println(f"[ab] rep $r $n%-24s $dt%6.2f s")
    }
    names.foreach { n =>
      val ts = times(n)
      println(f"[ab] MIN $n%-24s ${ts.min}%6.2f s  (median ${ts.sorted.apply(ts.size / 2)}%.2f)")
    }
    spark.stop()
  }
}

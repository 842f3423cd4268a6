package graft

import org.apache.spark.sql.DataFrame

import graft.dedup.SetSimJoin

/** Interleaved single-JVM A/B for the exact set-similarity join's
  * shape knobs (SetSimJoin.jaccardJoinImpl) — the measurement
  * discipline the repo's perf notes mandate: all shapes alternate in
  * ONE session so cross-session drift can't masquerade as a win; min
  * over ≥3 reps is the statistic.
  *
  * Usage: runMain graft.AbSetsim [sfDir] [reps]
  */
object AbSetsim {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/soak/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    def build(fused: Boolean, prune: Boolean, idx: Boolean = false)
             (d: String): DataFrame =
      SetSimJoin.jaccardJoinImpl(
        SetSimJoin.shingleRelation(Tables.documents(spark, d)),
        1L, 2L, fusedDf = fused, pruneVerify = prune, indexPrefix = idx)

    val shapes = Seq(
      "baseline" -> build(fused = false, prune = false) _,
      "fusedDf" -> build(fused = true, prune = false) _,
      // round-9 candidate: All-Pairs indexing-prefix asymmetry on the
      // (size, id)-smaller side — shorter join prefix, same recall
      "fused+idx" -> build(fused = true, prune = false, idx = true) _,
      "pruneVerify" -> build(fused = false, prune = true) _,
      "fused+prune" -> build(fused = true, prune = true) _,
      // the shipped query's exact shape: 25-row global sort on top —
      // measures what the final orderBy costs over the raw operator
      "fused+sort" -> ((d: String) =>
        build(fused = true, prune = false)(d).orderBy("id1", "id2")),
      // same canonical order without a range exchange (no sampling
      // job): collapse to one partition, sort locally
      "fused+c1sort" -> ((d: String) =>
        build(fused = true, prune = false)(d)
          .coalesce(1).sortWithinPartitions("id1", "id2")))

    // shapes must agree EXACTLY before any of them is timed
    val expected = shapes.head._2("/root/testdata/sf0.01")
      .orderBy("id1", "id2").collect().toSeq
    shapes.tail.foreach { case (n, f) =>
      val got = f("/root/testdata/sf0.01").orderBy("id1", "id2").collect().toSeq
      require(got == expected, s"shape $n diverges from baseline")
    }

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; (n, f) <- shapes) {
      val t0 = System.nanoTime()
      f(dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(n) = dt :: times.getOrElse(n, Nil)
      println(f"[ab] rep $r $n%-12s $dt%6.2f s")
    }
    shapes.foreach { case (n, _) =>
      println(f"[ab] MIN $n%-12s ${times(n).min}%6.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, desc}

import graft.dedup.Dedup

/** Interleaved single-JVM A/B for pageRank's AQE question — the
  * harness behind the round-9 decision to run the iterations under
  * the session's own conf (see GraphOps.pageRank's scaladoc).
  * Round 8 measured AQE-off winning at sf1 (min of TWO reps) and
  * shipped a session-global toggle; this harness alternates the
  * shapes within one session at any scale and showed the sf1 win was
  * noise (sf1: on 12.11 / off 12.77 s; sf0.1: on 2.62 / off 3.51 s)
  * while an isolated-twin scope adds 1.4-6 s of per-call session
  * overhead — so the operator now mutates nothing.
  *
  * Usage: runMain graft.AbPagerank [sfDir] [reps]
  */
object AbPagerank {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(d: String): DataFrame =
      Dedup.simhashPairs(Tables.documents(spark, d)).select("id1", "id2")

    def run(d: String): DataFrame =
      operators.GraphOps.pageRank(pairs(d), iterations = 5)
        .orderBy(desc("pr"), col("node")).limit(50)

    def runGlobalOff(d: String): DataFrame = {
      // the round-8 shape: session-global AQE toggle. pageRank
      // materializes its result eagerly, so the iterations all
      // execute inside this scope; the harness's trailing noop write
      // only pays the 50-row sort
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try run(d)
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    def runIsoNoFlip(d: String): DataFrame = {
      // isolated twin WITHOUT any conf flip: measures cloneSession's
      // per-call session overhead in isolation
      import org.apache.spark.sql.graftbridge.Bridge
      val iso = Bridge.isolatedTwin(spark)
      val p = Bridge.ofRows(iso, Bridge.analyzed(pairs(d)))
      val r = operators.GraphOps.pageRank(p, iterations = 5)
      Bridge.ofRows(spark, Bridge.analyzed(
        r.orderBy(desc("pr"), col("node")).limit(50)))
    }

    val shapes = Seq(
      "aqe-on" -> run _,
      "aqe-off-glob" -> runGlobalOff _,
      "iso-noflip" -> runIsoNoFlip _)

    println(s"[ab] pair count at $dir = ${pairs(dir).count()}")

    // all shapes must agree EXACTLY (integer-exact recurrence) before
    // any of them is timed
    val expected = shapes.head._2("/root/testdata/sf0.01").collect().toSeq
    shapes.tail.foreach { case (n, f) =>
      val got = f("/root/testdata/sf0.01").collect().toSeq
      require(got == expected, s"shape $n diverges from baseline")
    }

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; (n, f) <- shapes) {
      // each pageRank call localCheckpoints corpus-sized relations;
      // the blocks free only after a driver GC notices the dead RDD
      // refs (same hygiene as Soak.timeIn) — without this the 3rd+
      // rep at sf1 OOMs a broadcast build under squatting blocks
      System.gc()
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

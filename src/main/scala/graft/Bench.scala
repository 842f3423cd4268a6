package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is fully materialized through the noop sink (count()
  * would let Catalyst prune the computed columns away and measure a
  * hollowed-out plan).
  *
  * A full warm-up pass runs every query once at the smallest scale
  * factor first: the dominant one-shot cost is Janino whole-stage
  * codegen compilation + JIT (measured ~5-7s cold vs ~1-2s warm for
  * the heavy dedup plans), and the generated-code cache keys on plan
  * shape, which is identical across scale factors. Warm-up failures
  * are loud on stderr — a query that fails warm-up pays cold codegen
  * cost in the timed pass, which is exactly the skew warm-up exists
  * to remove.
  *
  * The timed measurement is min-of-3 passes per query (round 13 —
  * "≥3 is the house minimum for any adopted conclusion" applied to
  * the one artifact still at 2; BENCH_r12's session-long loadavg
  * ~6.7 inflated BOTH of a 2-pass run's sweeps for several rows):
  * steady-state execution is what a long-running cluster
  * experiences, and the min discards one-off interference (GC
  * pause, page-cache miss, a co-tenant stealing cores) that a
  * single pass bakes in. The pass count is reported in the JSON
  * ("passes") for transparency.
  *
  * De-correlated passes (round 12): the passes are FULL-SUITE SWEEPS
  * — pass 1 runs the whole alphabet, then pass 2 re-runs it — so a
  * query's two timings land ~85 s apart instead of back-to-back.
  * Co-tenant load bursts on this machine last minutes; back-to-back
  * passes sat inside the same burst and min-of-2 failed for ~8 rows
  * in round 11 (graph_bfs committed [4.45, 4.16] vs a 2.63 s
  * interleaved min). Sweep separation makes the two samples
  * independent draws from the load distribution, so the committed
  * min tracks the interleaved-A/B min.
  *
  * Spike transparency (round 11): the artifact records EVERY pass
  * time per query ("pass_times") plus the machine's 1-minute load
  * average at start and end ("loadavg"), because on this co-tenanted
  * machine a single pass can spike 2-13× (round 10's
  * agg_arg_extremes: committed 2.69 s vs a 0.26 s interleaved-A/B
  * min). With both passes in the record, a spike self-documents as
  * one outlier pass instead of requiring a re-run to diagnose;
  * `scripts/counts.py` prints the worst pass-ratio outliers.
  *
  * A query that throws in the timed pass is recorded in an "errors"
  * array and its time is reported as -1 — failures must be visible in
  * the artifact, not only on stderr.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    // comma-separated allowlist for isolated reruns (mirrors
    // SPARK_GRAFT_VERIFY_ONLY); absent = the full suite. Warm-up is
    // restricted too: an isolated run measures the query alone, not
    // the full suite's codegen-cache state.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
        }
      }
    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    // a query lands in "errors" (and reports -1) only when EVERY pass
    // failed; a transient single-pass failure is stderr-only and the
    // min is taken over the passes that succeeded
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").head.toDouble
      catch { case _: Throwable => -1.0 }
    // LOAD GATE (VERDICT r14 item 2): two consecutive official runs
    // drifted ~9% uniformly with nothing to arbitrate environment vs
    // code. Before the timed sweeps, wait (bounded) for the 1-minute
    // load to drop under the gate; the artifact records the gate, the
    // wait, and whether the run STARTED gated — a still-gated run is
    // loudly annotated, never silently averaged into history.
    val maxLoad = sys.env.get("SPARK_GRAFT_BENCH_MAX_LOAD")
      .map(_.toDouble).getOrElse(8.0)
    val maxWaitS = sys.env.get("SPARK_GRAFT_BENCH_MAX_WAIT_S")
      .map(_.toInt).getOrElse(600)
    var waitedS = 0
    while (load1() > maxLoad && waitedS < maxWaitS) {
      System.err.println(
        f"[bench] load gate: loadavg ${load1()}%.1f > $maxLoad%.1f — " +
          s"waiting (${waitedS}s/${maxWaitS}s)")
      Thread.sleep(15000); waitedS += 15
    }
    val gatedStart = load1() > maxLoad
    if (gatedStart)
      System.err.println(
        f"[bench] WARNING: starting GATED at loadavg ${load1()}%.1f > " +
          f"$maxLoad%.1f after ${waitedS}s — artifact will be annotated")
    val loadStart = load1()
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // sweep the full suite once per pass (pass 2+ re-runs the whole
    // alphabet) so a query's samples are minutes apart — independent
    // draws w.r.t. minutes-scale co-tenant load bursts
    val sweeps = (1 to passes).map { _ =>
      ordered.map { case (name, fn) => timeOnce(name, fn) }
    }
    val results = ordered.zipWithIndex.map { case ((name, _), i) =>
      val ts = sweeps.map(_(i))
      val ok = ts.filter(_ >= 0)
      if (ok.isEmpty) failed += name
      (name, if (ok.isEmpty) -1.0 else ok.min, ts)
    }
    val loadEnd = load1()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val pts = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val gate = s"""{"max_load":${fmt(maxLoad)},"waited_s":$waitedS,"gated_start":$gatedStart}"""
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"pass_times":$pts,"loadavg":{"start":${fmt(loadStart)},"end":${fmt(loadEnd)}},"load_gate":$gate,"errors":$errs}"""
    println(line)
    // the driver's artifact keeps only a truncated stdout tail, which
    // loses the first ~half of the per-query timings — persist the
    // complete record ourselves so every query has regression history
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // LAST LINE: a compact summary that FITS the driver's ~2000-char
    // stdout tail (VERDICT r15 item 4: the full per-query line is
    // ~40 KB, so the tail truncates its head and the driver's
    // `parsed` field came out null four rounds running). Headline
    // numbers + error list here; the complete per-query record is
    // the line above and the persisted file.
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","passes":$passes,"n_queries":${results.size},"loadavg":{"start":${fmt(loadStart)},"end":${fmt(loadEnd)}},"load_gate":$gate,"errors":$errs,"full_record":"$out"}"""
    println(compact)
    spark.stop()
  }
}

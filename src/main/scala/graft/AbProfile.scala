package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-rep stage-level decomposition of one SparkEntry query: driver
  * planning time vs executor task time vs GC, so a cross-build wall
  * gap can be attributed to a layer instead of re-measured forever.
  *
  * Usage: runMain graft.AbProfile <sfDir> <reps> <query> [warmupDir]
  * (warmup defaults to sfDir itself, so any fixture layout works;
  * pass a smaller dir, e.g. sf0.001, for a cheaper warmup)
  */
object AbProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val name = args.lift(2).getOrElse("agg_regression")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    object m {
      var runMs = 0L; var cpuNs = 0L; var gcMs = 0L
      var tasks = 0; var stages = 0
      def reset(): Unit = synchronized { runMs = 0; cpuNs = 0; gcMs = 0; tasks = 0; stages = 0 }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = m.synchronized {
        val tm = te.taskMetrics
        if (tm != null) {
          m.runMs += tm.executorRunTime; m.cpuNs += tm.executorCpuTime
          m.gcMs += tm.jvmGCTime; m.tasks += 1
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        m.synchronized { m.stages += 1 }
    })

    val warmupDir = args.lift(3).getOrElse(dir)
    SparkEntry.queries(name)(spark, warmupDir)
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      System.gc()
      m.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan // force analysis + optimization + physical planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(400) // let the listener bus drain
      m.synchronized {
        println(f"[prof] rep $r $name wall ${(t2 - t0) / 1e9}%6.3f s  " +
          f"plan ${(t1 - t0) / 1e9}%6.3f s  exec ${(t2 - t1) / 1e9}%6.3f s  " +
          f"taskRun ${m.runMs / 1e3}%7.2f s  taskCpu ${m.cpuNs / 1e9}%7.2f s  " +
          f"taskGc ${m.gcMs / 1e3}%5.2f s  tasks ${m.tasks}%4d  stages ${m.stages}%3d")
      }
    }
    spark.stop()
  }
}

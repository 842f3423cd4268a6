package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Interleaved A/B of ranking-trajectory loop shapes (round 17,
  * guide §1/§2): the per-iterate eager localCheckpoint + crossJoin
  * broadcast-n baseline vs (a) n as a one-time counted literal and
  * (b) literal n + LAZY per-iterate checkpoints materialized by ONE
  * final action on the unioned trajectory (the bfsRoundsAgg idiom).
  * Each variant's output must be row-identical to the baseline —
  * checked here with a symmetric-difference count before timing.
  * Measurement tool only; not part of the query surface. */
object AbLoopVariants {
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Variant A: literal n, eager per-iterate checkpoints. */
  def trajLitN(edgesDeg: DataFrame, iterations: Int,
               dampNum: Long, dampDen: Long, scale: Long): DataFrame = {
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val nNodes = nodes.count()
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    var pr = materialize(
      nodes.select(col("node"), lit(scale / nNodes).as("pr")))
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      pr = materialize(
        edgesDeg.as("e").join(pr.hint("shuffle_hash").as("p"),
            col("e.src") === col("p.node"))
          .groupBy(col("e.dst"))
          .agg(sum(expr("pr div deg")).as("in_sum"))
          .select(col("dst").as("node"),
            (lit(tp) + expr(s"($dampNum * in_sum) div $dampDen")).as("pr")))
      iterates :+= pr.withColumn("iter", lit(i))
    }
    iterates.reduce(_ unionByName _).select("node", "iter", "pr")
  }

  /** Variant B: literal n, lazy per-iterate checkpoints, one final
    * eager materialize of the whole union. */
  def trajLazy(edgesDeg: DataFrame, iterations: Int,
               dampNum: Long, dampDen: Long, scale: Long): DataFrame = {
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
    val nNodes = nodes.count()
    val tp = (scale * (dampDen - dampNum)) / dampDen / nNodes
    var pr = nodes.select(col("node"), lit(scale / nNodes).as("pr"))
      .localCheckpoint(eager = false)
    var iterates = Vector(pr.withColumn("iter", lit(0)))
    for (i <- 1 to iterations) {
      pr = edgesDeg.as("e").join(pr.hint("shuffle_hash").as("p"),
          col("e.src") === col("p.node"))
        .groupBy(col("e.dst"))
        .agg(sum(expr("pr div deg")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(tp) + expr(s"($dampNum * in_sum) div $dampDen")).as("pr"))
        .localCheckpoint(eager = false)
      iterates :+= pr.withColumn("iter", lit(i))
    }
    materialize(iterates.reduce(_ unionByName _)
      .select("node", "iter", "pr"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").map(_.toInt).getOrElse(4)
    val spark = GraftSession.get()

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    val pairs = dedup.Dedup.simhashPairs(docs)
      .select("id1", "id2").localCheckpoint(true)
    val st = operators.GraphOps.pageRankEdgeState(pairs)

    def run(name: String)(body: => DataFrame): DataFrame = {
      var out: DataFrame = null
      val ts = (1 to reps).map { _ =>
        val j0 = jobs; val t0 = System.nanoTime()
        out = body; noop(out)
        ((System.nanoTime() - t0) / 1e9, jobs - j0)
      }
      println(f"""{"variant":"$name","sec":${ts.map(_._1).min}%.3f,"jobs":${ts.last._2},"all":[${ts.map(t => f"${t._1}%.3f").mkString(",")}]}""")
      out
    }

    // equality gate first (cheap, once): both variants vs baseline
    val base = operators.GraphOps
      .pageRankTrajectoryFromEdges(st, iterations = 5)
    val a = trajLitN(st, 5, 85, 100, 1000000000000L)
    val b = trajLazy(st, 5, 85, 100, 1000000000000L)
    val diffA = base.exceptAll(a).count() + a.exceptAll(base).count()
    val diffB = base.exceptAll(b).count() + b.exceptAll(base).count()
    println(s"""{"eq_litN":${diffA == 0},"eq_lazy":${diffB == 0}}""")
    require(diffA == 0 && diffB == 0, "variant results differ!")

    // interleaved timing
    for (_ <- 1 to 2) {
      run("base") { operators.GraphOps
        .pageRankTrajectoryFromEdges(st, iterations = 5) }
      run("litN") { trajLitN(st, 5, 85, 100, 1000000000000L) }
      run("lazy") { trajLazy(st, 5, 85, 100, 1000000000000L) }
    }
    spark.stop()
  }
}

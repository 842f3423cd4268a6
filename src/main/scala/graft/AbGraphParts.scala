package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Phase-level A/B profiler for the graph IVM queries (round 17,
  * optimization guide §1: measure first). Decomposes the bench's
  * `graph_*_delta` / `graph_*_delete` queries into their phases —
  * pair mining, edge-state build, trajectory, fold — and times each
  * through the noop sink, with per-phase Spark job/stage counts from
  * a listener, so the optimization target is measured instead of
  * guessed. Prints one JSON line per phase. Measurement tool only:
  * not part of the query surface, never run by the driver. */
object AbGraphParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    import spark.implicits._

    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def phase(name: String)(body: => DataFrame): DataFrame = {
      // warm once (codegen), then time reps
      var out: DataFrame = null
      val times = (1 to reps).map { _ =>
        val j0 = jobs; val s0 = stages
        val t0 = System.nanoTime()
        out = body
        noop(out)
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, jobs - j0, stages - s0)
      }
      val best = times.minBy(_._1)
      println(f"""{"phase":"$name","sec":${best._1}%.3f,"jobs":${best._2},"stages":${best._3},"all":[${times.map(t => f"${t._1}%.3f").mkString(",")}]}""")
      out
    }

    val docs = Tables.documents(spark, sfDir)

    // ---- graph_ppr_delta decomposition ----
    spark.sparkContext.setJobDescription("parts: mine pairs")
    val pairs = phase("mine_simhash_pairs") {
      dedup.Dedup.simhashPairs(docs).select("id1", "id2").localCheckpoint(true)
    }
    spark.sparkContext.setJobDescription("parts: slice+delta prep")
    val d0 = pairs.filter((col("id1") + col("id2")) % 101 === 0)
    val p0 = pairs.filter((col("id1") + col("id2")) % 101 =!= 0)
    val nodes0 = p0.select(col("id1").as("node"))
      .unionByName(p0.select(col("id2").as("node"))).distinct()
    val delta = d0
      .join(nodes0.withColumnRenamed("node", "id1"), Seq("id1"), "left_semi")
      .join(nodes0.withColumnRenamed("node", "id2"), Seq("id2"), "left_semi")
    val seeds = docs.filter(col("doc_id") % 7 === 0).select("doc_id")

    spark.sparkContext.setJobDescription("parts: edge state")
    val st = phase("edge_state") {
      operators.GraphOps.pageRankEdgeState(p0)
    }
    spark.sparkContext.setJobDescription("parts: ppr trajectory")
    val traj = phase("ppr_trajectory") {
      operators.GraphOps.pprTrajectoryFromEdges(st, seeds, iterations = 5)
    }
    spark.sparkContext.setJobDescription("parts: ppr fold")
    phase("ppr_fold") {
      operators.GraphOps.pprDeltaFromState(traj, st, delta, seeds, iterations = 5)
        .orderBy(desc("pr"), col("node")).limit(50)
    }

    // plain pagerank twins off the same state
    spark.sparkContext.setJobDescription("parts: pr trajectory")
    val trajPr = phase("pr_trajectory") {
      operators.GraphOps.pageRankTrajectoryFromEdges(st, iterations = 5)
    }
    spark.sparkContext.setJobDescription("parts: pr fold")
    phase("pr_fold") {
      operators.GraphOps.pageRankDeltaFromState(trajPr, st, delta, iterations = 5)
        .orderBy(desc("pr"), col("node")).limit(50)
    }

    // ---- deletion twins: full-graph state, %13 retraction ----
    spark.sparkContext.setJobDescription("parts: delete state")
    val del = pairs.filter((col("id1") + col("id2")) % 13 === 0)
    val stF = phase("edge_state_full") {
      operators.GraphOps.pageRankEdgeState(pairs)
    }
    spark.sparkContext.setJobDescription("parts: delete traj")
    val trajF = phase("pr_trajectory_full") {
      operators.GraphOps.pageRankTrajectoryFromEdges(stF, iterations = 5)
    }
    spark.sparkContext.setJobDescription("parts: delete fold")
    phase("pr_delete_fold") {
      operators.GraphOps.pageRankDelete(trajF, stF, del, iterations = 5)
        .orderBy(desc("pr"), col("node")).limit(50)
    }

    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a comma-separated list of declared
  * queries (SPARK_GRAFT_PLAN_QUERIES) into SPARK_GRAFT_PLAN_DIR as
  * `<query>_<tag>.txt` (tag from SPARK_GRAFT_PLAN_TAG, e.g. before /
  * after) — the round-17 optimization evidence files under plans/r17/.
  * NOTE: eager materializations inside an operator (localCheckpoint)
  * run during construction and appear as LogicalRDD leaves in the
  * final plan; the dump still pins join strategies, exchange counts
  * and pushed filters for everything past the last checkpoint. */
object AbPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.get()
    Files.createDirectories(Paths.get(dir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(dir, s"${n}_$tag.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote $dir/${n}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
        case None => System.err.println(s"[plandump] no such query: $n")
      }
    }
    spark.stop()
  }
}

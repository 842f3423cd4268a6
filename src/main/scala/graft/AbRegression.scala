package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of regressionByFlag formulations: the shipped
  * decimal(30,4)-moments shape vs a long-scaled-integer shape that
  * keeps every per-row operation on primitive longs (floor-scaled
  * cents) and enters decimal only at the SUM buffer, where compact
  * (long-backed) adds apply.
  *
  * Usage: runMain graft.AbRegression <sfDir> <reps>
  */
object AbRegression {

  /** Long-scaled moments: x2 = 100x, y2 = 100y as exact longs
    * (floor(v*100 + 0.5) — v has <=2dp so the scaled int is exact);
    * products are long multiplies; sums accumulate in decimal(38,0)
    * (compact adds); the epilogue rescales to the same sx/sy/sxy/...
    * doubles as the decimal shape, then applies the identical fit. */
  def regressionLong(lineitem: DataFrame): DataFrame = {
    val x2 = floor(col("l_quantity") * lit(100.0) + lit(0.5))
    val y2 = floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    lineitem
      .select(col("l_returnflag"), x2.as("x2"), y2.as("y2"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("x2")).cast("double").as("sx2"),
        dsum(col("y2")).cast("double").as("sy2"),
        dsum(col("x2") * col("y2")).cast("double").as("sxy4"),
        dsum(col("x2") * col("x2")).cast("double").as("sxx4"),
        dsum(col("y2") * col("y2")).cast("double").as("syy4"))
      .select(col("l_returnflag"), col("n"),
        (col("sx2") / lit(1e2)).as("sx"), (col("sy2") / lit(1e2)).as("sy"),
        (col("sxy4") / lit(1e4)).as("sxy"), (col("sxx4") / lit(1e4)).as("sxx"),
        (col("syy4") / lit(1e4)).as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n"), 4).as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val shapes: Seq[(String, SparkSession => DataFrame)] = Seq(
      "dec30" -> (s => graft.operators.Relational.regressionByFlag(Tables.lineitem(s, dir))),
      "long2" -> (s => regressionLong(Tables.lineitem(s, dir))))
    // value sanity: both shapes must agree at round()ed precision
    val a = shapes(0)._2(spark).orderBy("l_returnflag").collect().toSeq
    val b = shapes(1)._2(spark).orderBy("l_returnflag").collect().toSeq
    println(s"[abreg] values equal: ${a == b}")
    if (a != b) { println(s"[abreg] A=$a"); println(s"[abreg] B=$b") }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; (n, f) <- shapes) {
      System.gc()
      val t0 = System.nanoTime()
      f(spark).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(n) = dt :: times.getOrElse(n, Nil)
      println(f"[abreg] rep $r $n%-8s $dt%6.3f s")
    }
    for ((n, _) <- shapes) {
      val ts = times(n)
      println(f"[abreg] MIN $n%-8s ${ts.min}%6.3f s  (median ${ts.sorted.apply(ts.size / 2)}%.3f)")
    }
    spark.stop()
  }
}

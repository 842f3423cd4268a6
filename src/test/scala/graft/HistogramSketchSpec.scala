package graft

import org.apache.spark.sql.functions._

import graft.functions.HistogramSketch

/** Histogram-sketch laws: additive mergeability, the one-bin-width
  * error bound against exact quantiles, and partitioning
  * invariance. */
class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Width = 10.0

  private lazy val valueSeq = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map(_ => rnd.nextDouble() * 1000.0)
  }
  private lazy val values = valueSeq.toDF("v")

  private def hist(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    HistogramSketch.histogram(df, "v", Width).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merge law: hist(A union B) = binwise sum") {
    val (a, b) = valueSeq.splitAt(2000)
    val merged = (hist(a.toDF("v")).toSeq ++ hist(b.toDF("v")).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(hist(values) == merged)
  }

  test("partitioning invariance of the full quantile pipeline") {
    def run(parts: Int) = HistogramSketch.quantiles(
      HistogramSketch.histogram(values.repartition(parts), "v", Width),
      Seq(0.5, 0.9, 0.99), Width)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("estimates are within one bin width above the exact quantile") {
    val got = HistogramSketch.quantiles(
      HistogramSketch.histogram(values, "v", Width),
      Seq(0.5, 0.9, 0.99), Width)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = valueSeq.sorted
    got.foreach { case (q, est) =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      assert(est >= exact && est - exact <= Width,
        s"q=$q est=$est exact=$exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Laws of the declarative count-min sketch: the relational cell form
  * must behave exactly like the counter matrix it denotes — same
  * cells under any partitioning, additive under union (the merge law
  * that makes it distributable), and never under-counting. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private lazy val termSeq = {
    val rnd = new scala.util.Random(77)
    // zipfish alphabet: a few hot terms, a long tail
    (1 to 3000).map { _ =>
      if (rnd.nextInt(4) == 0) s"hot${rnd.nextInt(3)}"
      else s"t${rnd.nextInt(500)}"
    }
  }
  private lazy val terms = termSeq.toDF("term")

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    CountMin.sketch(df, "term", depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("partitioning invariance: identical cells at 1 and 7 partitions") {
    assert(cells(terms.repartition(1)) == cells(terms.repartition(7)))
  }

  test("merge law: cells(A union B) = cellwise sum of cells(A) and cells(B)") {
    val (sa, sb) = termSeq.splitAt(1200)
    val merged = (cells(sa.toDF("term")).toSeq ++ cells(sb.toDF("term")).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(cells(terms) == merged)
  }

  test("weighted sketch over per-item counts equals the raw-stream sketch") {
    val counts = terms.groupBy("term").agg(count(lit(1)).as("w"))
    val weighted = CountMin.sketchWeighted(counts, "term", "w", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(weighted == cells(terms))
  }

  test("estimates never under-count, and are exact when a cell is collision-free") {
    val sk = CountMin.sketch(terms, "term", depth, width)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact")).as("e")
    val est = CountMin.estimate(sk, exact.select("term"), "term", depth, width)
    val rows = est.join(exact, "term")
      .select(col("term"), col("cms_est"), col("exact")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"under-count on ${r.getString(0)}")
    }
    // total mass per sketch row is the stream length — conservation law
    val n = terms.count()
    val perRow = sk.groupBy("row_i").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getLong(1))
    assert(perRow.length == depth && perRow.forall(_ == n))
  }

  test("the sketch maintains incrementally on a stream: final cells equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    // the same declarative cell formulation, in update mode — a
    // streaming groupBy IS the incremental sketch maintenance
    val cellsStream = CountMin.sketch(
      input.toDF().toDF("term"), "term", depth, width)
    val query = cellsStream.writeStream.format("memory")
      .queryName("cms_stream").outputMode("update").start()
    try {
      val (a, b) = termSeq.splitAt(1700)
      input.addData(a: _*)
      query.processAllAvailable()
      input.addData(b: _*)
      query.processAllAvailable()
      // update mode re-emits revised cells; the max per cell is the
      // current value (counts only grow)
      val streamed = spark.table("cms_stream")
        .groupBy("row_i", "bucket")
        .agg(max("cnt").as("cnt")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == cells(terms))
    } finally query.stop()
  }

  test("unseen items estimate from empty cells as >= 0 (never negative, usually 0 at wide width)") {
    val sk = CountMin.sketch(terms, "term", depth, width = 4096)
    val unseen = Seq("never-seen-a", "never-seen-b").toDF("term")
    val got = CountMin.estimate(sk, unseen, "term", depth, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ >= 0L))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, MisraGries}

/** Two-phase exact heavy hitters: candidate guarantee, exactness vs
  * the full groupBy, layout invariance, certificate enforcement. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish items: item i appears ~10000/(i+1) times. */
  private lazy val items = {
    val rows = (0 until 200).flatMap(i => Seq.fill(10000 / (i + 1))(s"item$i"))
    rows.toDF("term")
  }

  test("streaming candidates: bounded state tracks the hot items across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val q = graft.functions.HeavyHitters
      .streamingCandidates(input.toDF().toDF("term"), "term", capacity = 8)
      .writeStream.format("memory").outputMode("complete")
      .queryName("hh_stream").start()
    try {
      // batch 1: "hot" dominates; batch 2: "hot2" surges — the ONE
      // summary row must fold both, still holding the global heavies
      input.addData(Seq.fill(500)("hot") ++ (1 to 50).map(i => s"cold$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(400)("hot2") ++ Seq.fill(100)("hot"): _*)
      q.processAllAvailable()
      val row = spark.table("hh_stream").collect().last
      val cands = row.getAs[scala.collection.Seq[String]]("candidates")
      val n = row.getAs[Long]("n")
      assert(n == 1050L, s"summary must count every row ever seen: $n")
      assert(cands.contains("hot") && cands.contains("hot2"),
        s"both hot items must survive the bounded summary: $cands")
      assert(cands.size <= 8, s"state must stay capacity-bounded: $cands")
      // MG guarantee: anything with true count > err is a candidate
      val err = row.getAs[Long]("err")
      assert(600L > err && 400L > err, s"err=$err must bound the heavies")
    } finally q.stop()
  }

  test("streaming distinct: KMV state stays k-bounded, exact below k, folds batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val q = graft.functions.HeavyHitters
      .streamingDistinct(input.toDF().toDF("term"), "term", k = 64)
      .writeStream.format("memory").outputMode("complete")
      .queryName("kmv_stream").start()
    try {
      input.addData((1 to 20).map(i => s"a$i"): _*)
      q.processAllAvailable()
      assert(spark.table("kmv_stream").collect().last.getDouble(0) == 20.0,
        "below k the estimate is exact")
      // second batch: 10 repeats + 15 new -> 35 distinct total
      input.addData(((1 to 10).map(i => s"a$i") ++
        (1 to 15).map(i => s"b$i")): _*)
      q.processAllAvailable()
      assert(spark.table("kmv_stream").collect().last.getDouble(0) == 35.0,
        "repeats across batches must not inflate the distinct count")
    } finally q.stop()
  }

  test("exactTopK equals the exact full groupBy top-k") {
    val expect = items.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"term").limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = HeavyHitters.exactTopK(items, "term", 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expect)
  }

  test("result is invariant under repartitioning (sketch internals are not exposed)") {
    def run(parts: Int) =
      HeavyHitters.exactTopK(items.repartition(parts), "term", 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) === run(13))
  }

  test("per-group exactTopK equals the per-group exact ranking") {
    import org.apache.spark.sql.expressions.Window
    val grouped = (0 until 3).flatMap { g =>
      (0 until 100).flatMap(i =>
        Seq.fill(10000 / (i + g * 3 + 1))((s"g$g", s"item$i")))
    }.toDF("g", "term")
    val w = Window.partitionBy($"g").orderBy($"cnt".desc, $"term")
    val expect = grouped.groupBy($"g", $"term")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = HeavyHitters.exactTopKPerGroup(grouped, "g", "term", 4,
        capacity = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("certified variant passes with ample capacity, throws when the proof fails") {
    val ok = HeavyHitters.exactTopKCertified(items, "term", 5, capacity = 256)
      .collect()
    assert(ok.length == 5)
    // near-uniform data with tiny capacity: kth count can't clear n/(cap+1)
    val flat = (0 until 1000).flatMap(i => Seq.fill(5)(s"u$i")).toDF("term")
    val ex = intercept[IllegalStateException] {
      HeavyHitters.exactTopKCertified(flat, "term", 5, capacity = 8)
    }
    assert(ex.getMessage.contains("raise capacity"), ex.getMessage)
  }

  test("MG merge guarantee: every item above n/(capacity+1) survives any merge split") {
    val mg = new MisraGries(8)
    val stream = (0 until 500).map(i => if (i % 5 == 0) "hot" else s"cold$i")
    // split the stream at several points and merge the halves
    for (cut <- Seq(1, 100, 250, 499)) {
      val (a, b) = stream.splitAt(cut)
      val bufA = a.foldLeft(mg.zero)(mg.reduce)
      val bufB = b.foldLeft(mg.zero)(mg.reduce)
      val (keys, n, err) = mg.finish(mg.merge(bufA, bufB))
      assert(n == 500)
      assert(err <= 500 / 9, s"err=$err exceeds the n/(capacity+1) bound")
      // "hot" has frequency 100 > err — must be a candidate
      assert(keys.contains("hot"), s"cut=$cut lost the heavy item: $keys")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.dedup.Dedup
import graft.operators.GraphOps

/** Interleaved single-JVM A/B for bfsHops' round shape: the shipped
  * min-aggregate fold (one shuffle per round, flat visited relation)
  * vs the first-cut distinct + anti-join round (three shuffles per
  * round, anti-join side re-scans every prior frontier checkpoint).
  * Both produce identical output (asserted here per rep); the
  * question is purely per-round cost at a given scale.
  *
  * Round-9 result. sf0.1 (idle machine, 5 interleaved reps): the
  * shapes TIE — agg-fold min 3.40 / median 3.51 s, anti-join min
  * 3.13 / median 3.35 s, parity 0 — because the similarity graph's
  * diameter is ~3 and per-round cost (0.06-0.11 s, profiled) is
  * dwarfed by pair generation + edge setup (~1.5 s). sf1 (10× data,
  * 3 interleaved reps): agg-fold wins EVERY rep — min 17.11 /
  * median 17.75 s vs anti-join 18.14 / 19.27 s — the scale where the
  * round cost matters. The agg fold ships: one shuffle per round
  * with O(1) checkpoint scans, where the anti-join round re-scans k
  * checkpoints at round k — the term that grows with diameter.
  *
  * Usage: runMain graft.AbBfs [sfDir] [reps]
  */
object AbBfs {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    def run(agg: Boolean, d: String): DataFrame = {
      val docs = Tables.documents(spark, d)
      GraphOps.bfsHops(
        Dedup.simhashPairs(docs).select("id1", "id2"),
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"),
        aggShape = agg)
    }

    // warm both shapes at the smallest scale (codegen/JIT, not data)
    Seq(true, false).foreach(run(_, "/root/testdata/sf0.001").write
      .format("noop").mode("overwrite").save())

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; agg <- Seq(true, false)) {
      System.gc()
      val name = if (agg) "agg-fold" else "anti-join"
      val t0 = System.nanoTime()
      run(agg, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"[ab] rep $r $name%-10s $dt%6.2f s")
    }
    val parity = run(agg = true, dir).unionByName(run(agg = false, dir))
      .groupBy("doc_id", "hops").count().filter(col("count") =!= 2).count()
    println(s"[ab] parity (rows not in both outputs): $parity")
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[ab] MIN $n%-10s ${ts.min}%6.2f s  (median ${ts.sorted.apply(ts.size / 2)}%.2f)")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Forget

class ForgetSpec extends SparkSpec {
  import spark.implicits._

  test("audit counts removed rows per artifact; after = before - removed") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val derived = Seq((1L, 0), (1L, 1), (2L, 0), (4L, 0), (4L, 1))
      .toDF("doc_id", "part")
    val ids = Seq(Tuple1(1L), Tuple1(4L), Tuple1(99L)).toDF("doc_id")
    val rep = Forget.report(
        Seq(("corpus", corpus, "doc_id"), ("derived", derived, "doc_id")),
        ids)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep("corpus") == ((4L, 2L, 2L)))
    assert(rep("derived") == ((5L, 4L, 1L)))  // 2 + 2 rows derive from 1,4
  }

  test("duplicate forget ids do not double-count removals") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val ids = Seq(Tuple1(1L), Tuple1(1L)).toDF("doc_id")
    val Array(row) =
      Forget.report(Seq(("corpus", corpus, "doc_id")), ids).collect()
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((2L, 1L, 1L)))
  }

  test("deletion applies in-flight: stream-static anti-join drops forgotten ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val forget = Seq(Tuple1(2L), Tuple1(4L)).toDF("doc_id")
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDS().toDF("doc_id", "text")
      .join(broadcast(forget), Seq("doc_id"), "left_anti")
      .writeStream.outputMode("append")
      .format("memory").queryName("forget_stream").start()
    try {
      input.addData((1L, "keep"), (2L, "drop"), (3L, "keep"))
      q.processAllAvailable()
      input.addData((4L, "drop"), (5L, "keep"))
      q.processAllAvailable()
      val kept = spark.table("forget_stream")
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L, 5L))
    } finally q.stop()
  }

  test("the deletion the audit reports is the anti-join the pipeline runs") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val ids = docs.filter(pmod($"doc_id", lit(97)) === 0).select("doc_id")
    val rep = Forget.corpusAudit(docs,
        Tables.embeddings(spark, sf("sf0.001")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep("documents") == docs.join(ids, Seq("doc_id"), "left_anti").count())
  }
}

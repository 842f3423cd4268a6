package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamJoins

/** Stream-stream interval join: matches within the time bound, no
  * matches outside it, many-to-many semantics, and left-outer
  * emission of unmatched rows once the watermark passes. */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("inner interval join matches clicks within 5s of the impression, same user") {
    val imps = MemoryStream[(String, String, Timestamp)](spark)
    val clks = MemoryStream[(String, String, Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("user_id", "imp_id", "imp_ts"),
      clks.toDF().toDF("user_id", "clk_id", "clk_ts"),
      keys = Seq("user_id"), leftTs = "imp_ts", rightTs = "clk_ts",
      rangeSec = 5L)
      .select(col("imp_id"), col("clk_id"))
    val query = joined.writeStream.format("memory")
      .queryName("ssj_inner").outputMode("append").start()
    try {
      imps.addData(("u1", "i1", ts(100)), ("u1", "i2", ts(200)), ("u2", "i3", ts(100)))
      clks.addData(
        ("u1", "c1", ts(103)),  // matches i1 (within 5s)
        ("u1", "c2", ts(108)),  // 8s after i1, 92s before i2: no match
        ("u2", "c3", ts(100)),  // matches i3 (same instant)
        ("u2", "c4", ts(201)))  // u2 has no impression near 201
      query.processAllAvailable()
      val got = spark.table("ssj_inner").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("i1", "c1"), ("i3", "c3")))
    } finally query.stop()
  }

  test("left outer emits unmatched impressions after the watermark passes; matches are many-to-many") {
    val imps = MemoryStream[(String, String, Timestamp)](spark)
    val clks = MemoryStream[(String, String, Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("user_id", "imp_id", "imp_ts"),
      clks.toDF().toDF("user_id", "clk_id", "clk_ts"),
      keys = Seq("user_id"), leftTs = "imp_ts", rightTs = "clk_ts",
      rangeSec = 5L, watermark = "10 seconds", joinType = "leftOuter")
      .select(col("imp_id"), col("clk_id"))
    val query = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      // two impressions share one click (many-to-many); i9 never clicks
      imps.addData(("u1", "i1", ts(100)), ("u1", "i2", ts(99)), ("u1", "i9", ts(200)))
      clks.addData(("u1", "c1", ts(102)))
      query.processAllAvailable()
      // push both watermarks far past i9's eviction bound (200 + 5 + 10)
      imps.addData(("u9", "iFlush", ts(1000)))
      clks.addData(("u9", "cFlush", ts(1000)))
      query.processAllAvailable()
      val got = spark.table("ssj_outer").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(got.contains(("i1", Some("c1"))) && got.contains(("i2", Some("c1"))),
        s"many-to-many matches missing: $got")
      assert(got.contains(("i9", None)), s"unmatched i9 not emitted: $got")
    } finally query.stop()
  }

  test("invalid join type and range are rejected loudly") {
    val df = Seq(("u", "x", ts(0))).toDF("user_id", "id", "t")
    intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(df, df.toDF("user_id", "id2", "t2"),
        Seq("user_id"), "t", "t2", rangeSec = 5, joinType = "full")
    }
    intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(df, df.toDF("user_id", "id2", "t2"),
        Seq("user_id"), "t", "t2", rangeSec = 0)
    }
  }
}

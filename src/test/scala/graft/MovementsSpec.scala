package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Movements

/** Batch reference-parity operators against hand-built fixtures with
  * known answers (SURVEY §5.1 — LOCF leading-sentinel drop, heatmap
  * golden map, session gaps). */
class MovementsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // us per second

  /** (event_id, user_id, event_type, value, k) → canonical events DF.
    * x = floor(value/10); y = k; sentinel = event_type "error". */
  private def mkEvents(rows: Seq[(Long, Long, String, Double, Int)]) =
    rows.toDF("event_id", "user_id", "event_type", "value", "k")
      .withColumn("props", concat(lit("{\"k\": "), col("k"), lit("}")))
      .drop("k")
      .withColumn("ts_us", col("event_id") * S) // 1 event/sec
      .withColumn("sec", expr("ts_us div 1000000"))

  test("LOCF carries last real position over sentinels; leading sentinels stay null") {
    val ev = mkEvents(Seq(
      (0L, 1L, "error", 0.0, 0),   // leading sentinel: must stay NULL
      (1L, 1L, "click", 25.0, 7),  // pos (2,7)
      (2L, 1L, "error", 0.0, 0),   // carry (2,7)
      (3L, 1L, "error", 0.0, 0),   // carry (2,7)
      (4L, 1L, "view", 99.0, 3),   // pos (9,3)
      (5L, 2L, "error", 0.0, 0)))  // other user, leading sentinel
    val got = Movements.locf(ev).orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (0L, None, None),
      (1L, Some(2), Some(7)),
      (2L, Some(2), Some(7)),
      (3L, Some(2), Some(7)),
      (4L, Some(9), Some(3)),
      (5L, None, None)))
  }

  test("interpolation blends sentinels linearly; edges backfill/carry") {
    val ev = mkEvents(Seq(
      (0L, 1L, "error", 0.0, 0),   // leading: backfill from (2,7)
      (1L, 1L, "click", 25.0, 7),  // real (2,7) at t=1s
      (2L, 1L, "error", 0.0, 0),   // 1/3 of the way (1s..4s)
      (3L, 1L, "error", 0.0, 0),   // 2/3 of the way
      (4L, 1L, "move", 85.0, 1),   // real (8,1) at t=4s
      (5L, 1L, "error", 0.0, 0),   // trailing: carry (8,1)
      (6L, 2L, "error", 0.0, 0)))  // user with no real position: NULL
    val got = Movements.interpolated(ev)
      .orderBy("user_id", "event_id")
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got(0) === ((0L, 2.0, 7.0)), s"leading backfill: ${got(0)}")
    assert(got(1) === ((1L, 2.0, 7.0)))
    assert(got(2) === ((2L, 2.0 + 6.0 * (1.0 / 3.0), 7.0 + (-6.0) * (1.0 / 3.0))))
    assert(got(3) === ((3L, 2.0 + 6.0 * (2.0 / 3.0), 7.0 + (-6.0) * (2.0 / 3.0))))
    assert(got(4) === ((4L, 8.0, 1.0)))
    assert(got(5) === ((5L, 8.0, 1.0)), s"trailing carry: ${got(5)}")
    assert(got(6) === ((6L, null, null)), s"no-position user: ${got(6)}")
  }

  test("interpolation plan shares one exchange and one sort across both window passes") {
    val ev = mkEvents(Seq((0L, 1L, "click", 25.0, 7), (1L, 1L, "error", 0.0, 0)))
    val df = Movements.interpolated(ev)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange:\n$p")
    assert(sorts == 1, s"expected 1 sort (shared by both frames):\n$p")
  }

  test("heatmap counts carried positions and drops never-positioned rows") {
    val ev = mkEvents(Seq(
      (0L, 1L, "error", 0.0, 0),
      (1L, 1L, "click", 25.0, 7),
      (2L, 1L, "error", 0.0, 0),
      (3L, 1L, "view", 25.0, 7),
      (4L, 1L, "view", 99.0, 3)))
    val got = Movements.heatmap(ev, 1L, k = 10).orderBy("cx", "cy")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // (2,7): real at t1, carried at t2, real at t3 = 3; (9,3): 1
    assert(got.toSeq == Seq((2, 7, 3L), (9, 3, 1L)))
  }

  test("heatmap restricts to the k most recent seconds") {
    val ev = mkEvents((0L until 20L).map(i => (i, 1L, "click", 10.0 * i, 1)))
    // k=5 → seconds 15..19 → positions x = 15..19
    val got = Movements.heatmap(ev, 1L, k = 5).collect()
      .map(r => r.getInt(0)).sorted
    assert(got.toSeq == Seq(15, 16, 17, 18, 19))
  }

  test("sessions split on gaps > threshold") {
    val rows = Seq( // user 1: events at sec 0,1,2, then 1000,1001
      (0L, 0L), (1L, 1L), (2L, 2L), (3L, 1000L), (4L, 1001L))
      .toDF("event_id", "sec0")
    val ev = rows
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{\"k\": 1}"))
      .withColumn("ts_us", col("sec0") * S)
      .withColumn("sec", col("sec0"))
    val got = Movements.sessions(ev, gapSec = 600)
      .orderBy("session_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 2L), (2L, 2L, 1L)))
  }

  test("single-pass heatmap aggregator matches the composed plan") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // composed: groupBy counts + separate max
    val composed = Movements.heatmap(ev, 1L).orderBy("cx", "cy").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val composedMax = Movements.heatmapMax(ev, 1L).collect()(0).getLong(0)
    // fused: one typed pass over the same LOCF-resolved positions
    val user = ev.filter(col("user_id") === 1L)
    val recent = user.groupBy(col("sec")).agg(count(lit(1)).as("c"))
      .orderBy(col("sec").desc).limit(10).select(col("sec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val positions = Movements.positioned(user.join(broadcast(recent), "sec"))
      .withColumn("cx", last(col("x"), ignoreNulls = true).over(w))
      .withColumn("cy", last(col("y"), ignoreNulls = true).over(w))
      .filter(col("cx").isNotNull)
      .select(col("cx"), col("cy")).as[(Int, Int)]
    val fused = positions.select(
      graft.functions.HeatmapAggregator.toColumn.name("hm")).collect()(0)
    assert(fused.points.map(p => (p.x, p.y, p.value)) == composed.toSeq)
    assert(fused.max == composedMax)
  }

  test("per-second aggregate retains sorted raw events") {
    val ev = mkEvents(Seq((0L, 1L, "click", 25.0, 7)))
      .withColumn("ts_us", lit(5L * S + 123L))
      .withColumn("sec", lit(5L))
    val row = Movements.perSecond(ev).collect()(0)
    assert(row.getAs[Long]("cnt") == 1L)
    val movs = row.getAs[scala.collection.Seq[Row]]("movs")
    assert(movs.map(m => (m.getLong(0), m.getInt(1), m.getInt(2))) ==
      Seq((5L * S + 123L, 2, 7)))
  }

  test("bot signals: scripted straight line maxes straightness; human wiggle doesn't") {
    // u1 moves on the line y = x (collinear everywhere); u2 zigzags
    val ev = mkEvents(Seq(
      (1L, 1L, "move", 10.0, 1), (2L, 1L, "move", 20.0, 2),
      (3L, 1L, "move", 30.0, 3), (4L, 1L, "move", 40.0, 4),
      (11L, 2L, "move", 10.0, 1), (12L, 2L, "move", 20.0, 9),
      (13L, 2L, "move", 30.0, 1), (14L, 2L, "move", 40.0, 9)))
    val out = Movements.botSignals(ev).orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("straight8") == 1.0)
    assert(out(2L).getAs[Double]("straight8") == 0.0)
    // 1 event/sec cadence: every gap exactly 1s -> var numerator 0,
    // floor mean exactly 1e6. var_gap_num ships as a STRING — the
    // exact numerator can exceed 2^53, past any float-safe readout
    assert(out(1L).getAs[Long]("mean_gap_floor_us") == 1000000L)
    assert(BigInt(out(1L).getAs[String]("var_gap_num")) == BigInt(0))
    assert(out(1L).getAs[Long]("max_per_sec") == 1L)
  }

  test("bot signals: burst counting and sentinel exclusion") {
    // three events in one second; sentinels carry no position and
    // must not join the trajectory
    val ev = mkEvents(Seq(
      (1L, 1L, "move", 10.0, 1), (2L, 1L, "error", 0.0, 0),
      (3L, 1L, "move", 30.0, 3)))
      .withColumn("ts_us", lit(5L * S) + col("event_id")) // all in sec 5
      .withColumn("sec", expr("ts_us div 1000000"))
    val r = Movements.botSignals(ev).collect()(0)
    assert(r.getAs[Long]("n_moves") == 2L)     // sentinel excluded
    assert(r.getAs[Long]("max_per_sec") == 2L) // burst of positioned events
  }
}

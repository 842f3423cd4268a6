package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Sweep-line concurrency: hand-checked levels, the half-open tie
  * rule (an end and a start at the same instant never overlap), and
  * cross-bucket offset carry. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("sweep concurrency: known levels, half-open ties, bucket carryover") {
    // [0,10) [5,15) [10,20): level 2 on [5,10) and [10,15); at t=10
    // the first interval's end processes before the third's start.
    // Bucket 2's only edge is the final end at t=20 — its max is the
    // CARRY-IN level 1 (one interval open over [20, 20)... i.e. the
    // instant before), not the post-edge 0
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L)).toDF("lo", "hi")
    val got = TimeSeries.sweepConcurrency(iv, "lo", "hi", bucketUs = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("sweep concurrency: an interval spanning silent buckets carries its level") {
    // one interval [0, 35) plus a short one inside bucket 3 — buckets
    // 1 and 2 have no edges and are absent (emit-on-change), but the
    // offset into bucket 3 must still count the long interval
    val iv = Seq((0L, 35L), (31L, 33L)).toDF("lo", "hi")
    val got = TimeSeries.sweepConcurrency(iv, "lo", "hi", bucketUs = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 3L -> 2L))
  }

  test("sliding distinct: exact when windows hold < k distinct keys; windows obey the range frame") {
    val rnd = new scala.util.Random(41)
    // 40 distinct keys (< k=64): every estimate must be EXACT
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(3000).toLong, s"u${rnd.nextInt(40)}")
    }
    val df = rows.toDF("sec", "uid")
    val got = TimeSeries.slidingDistinct(df, "uid",
      bucketSec = 300, windowBuckets = 6, k = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = rows.map { case (s, u) => (s / 300, u) }.distinct
      .groupBy(_._1).keys.toSeq.sorted.map { b =>
      val inWin = rows.filter { case (s, _) =>
        val sb = s / 300; sb <= b && sb >= b - 5 }
      b -> inWin.map(_._2).distinct.size.toDouble
    }.toMap
    assert(got == expect)
  }

  test("sweep concurrency matches a brute-force per-instant check on random intervals") {
    val rnd = new scala.util.Random(31)
    val ivs = (1 to 300).map { _ =>
      val lo = rnd.nextInt(500).toLong
      (lo, lo + 1 + rnd.nextInt(80))
    }
    val got = TimeSeries.sweepConcurrency(
      ivs.toDF("lo", "hi"), "lo", "hi", bucketUs = 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over CONTINUOUS time: per emitted bucket, the max of
    // the carry-in level (at the bucket's first edge instant, just
    // before it) and the level after each edge instant in the bucket
    def levelAt(t: Long) = ivs.count(i => i._1 <= t && t < i._2)
    val edgeTs = ivs.flatMap(i => Seq(i._1, i._2)).distinct
    val expect = edgeTs.groupBy(_ / 50L).view.map { case (b, ts) =>
      val carryIn = levelAt(ts.min - 1)
      b -> (carryIn +: ts.map(levelAt)).max
    }.toMap
    assert(got == expect)
  }

  test("funnel: steps require strict order; out-of-order types don't convert") {
    import spark.implicits._
    // u1 completes view->click->purchase; u2 purchases BEFORE clicking
    // (no conversion past step 2); u3 only views
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "view", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      (3L, "view", 100L),
      (4L, "error", 50L))
      .toDF("user_id", "event_type", "ts_us")
    val rows = graft.operators.TimeSeries.conversionFunnel(ev)
      .orderBy("step").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("1:view", 3L, 0.75),      // u4 never views
      ("2:click", 2L, 0.5),      // u1, u2
      ("3:purchase", 1L, 0.25))) // only u1 purchases after clicking
  }

  test("retention: cohort = first active period; rates are cohort-relative") {
    import spark.implicits._
    // cohort 0: u1 (active periods 0,1,2), u2 (0,2); cohort 1: u3 (1)
    val ev = Seq(
      (1L, 0L), (1L, 100000L), (1L, 200000L),
      (2L, 50L), (2L, 210000L),
      (3L, 100000L))
      .toDF("user_id", "sec")
    val rows = graft.operators.TimeSeries
      .cohortRetention(ev, periodSec = 100000L)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L, 1.0),
      (0L, 1L, 1L, 0.5),   // only u1 returns in period 1
      (0L, 2L, 2L, 1.0),   // both return in period 2
      (1L, 0L, 1L, 1.0)))  // u3's own cohort
  }

  test("A/B readout: exact per-arm rates, diff, and z from parity arms") {
    import spark.implicits._
    // arm 0: users 2,4 (one converts); arm 1: users 1,3 (both convert)
    val ev = Seq(
      (1L, "purchase", 1L, 10L), (1L, "view", 2L, 20L),
      (2L, "purchase", 3L, 10L), (3L, "purchase", 4L, 10L),
      (4L, "view", 5L, 10L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val r = graft.operators.TimeSeries.abConversion(ev).collect()(0)
    assert(r.getAs[Long]("users_a") == 2L && r.getAs[Long]("conv_a") == 1L)
    assert(r.getAs[Long]("users_b") == 2L && r.getAs[Long]("conv_b") == 2L)
    assert(r.getAs[Double]("rate_a8") == 0.5 && r.getAs[Double]("rate_b8") == 1.0)
    assert(r.getAs[Double]("diff8") == -0.5)
    // rb(1-rb)=0, so se = sqrt(0.25/2) and z = -0.5/se
    val se = math.sqrt(0.125)
    assert(math.abs(r.getAs[Double]("se8") -
      BigDecimal(se).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(r.getAs[Double]("z8") -
      BigDecimal(-0.5 / se).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("paths: first-k sequence per user with deterministic tiebreaks") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 1L, 10L), (1L, "click", 2L, 20L), (1L, "purchase", 3L, 30L),
      (1L, "error", 4L, 40L), // beyond k=3, ignored
      (2L, "view", 5L, 10L), (2L, "click", 6L, 20L), (2L, "purchase", 7L, 30L),
      (3L, "signup", 8L, 10L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val rows = graft.operators.TimeSeries.topPaths(ev)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("view->click->purchase", 2L), ("signup", 1L)))
  }

  test("funnel windows chain behind a single exchange") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val plan = graft.operators.TimeSeries.conversionFunnel(ev)
      .queryExecution.optimizedPlan
    val exchanges = plan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // all three step windows share the user partition; no explicit
    // repartitions sneak in
    assert(exchanges.isEmpty)
    assert(windows.forall(_.partitionSpec.length == 1))
  }

  test("rate anomalies: spike over a flat baseline flags; cold start never") {
    // 10 buckets of exactly 10 events, then a 100-event spike
    val ev = ((0 until 10).flatMap(b => Seq.fill(10)(b.toLong * 60)) ++
      Seq.fill(100)(600L))
      .map(s => ("click", s)).toDF("event_type", "sec")
    val got = TimeSeries.rateAnomalies(ev, bucketSec = 60L)
      .orderBy("bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(5)))
    // flat baseline: zero variance AND zero deviation -> never flagged
    assert(got.take(10).forall(_._3 == 0))
    // the spike: deviation 900, variance 0 -> flagged
    assert(got(10) == ((600L, 100L, 1)))
    // a spike at bucket 2 has only 2 trailing buckets -> cold start,
    // not flagged regardless of deviation
    val cold = (Seq.fill(10)(0L) ++ Seq.fill(10)(60L) ++ Seq.fill(100)(120L))
      .map(s => ("click", s)).toDF("event_type", "sec")
    val coldGot = TimeSeries.rateAnomalies(cold, bucketSec = 60L)
      .orderBy("bucket_start").collect().map(_.getInt(5))
    assert(coldGot.forall(_ == 0))
  }

  test("seasonal decomposition: residuals vanish on a pure cycle") {
    // two days of a perfect daily cycle: hour h always has h+1 events
    val ev = (for {
      day <- 0 until 2; h <- 0 until 24; i <- 0 to h
    } yield ("click", day * 86400L + h * 3600L))
      .toDF("event_type", "sec")
    val got = TimeSeries.seasonalDecompose(ev)
      .orderBy("bucket_start").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == 48)
    // expected = the hour-of-day mean = the count itself; resid 0
    assert(got.forall { case (hod, n, exp, res) =>
      n == hod + 1 && exp == (hod + 1).toDouble && res == 0.0 })
    // break the cycle once: the residual lands on the deviation
    val bent = ev.union(Seq(("click", 86400L + 5 * 3600L))
      .toDF("event_type", "sec"))
    val r5 = TimeSeries.seasonalDecompose(bent)
      .filter($"hod" === 5).orderBy("bucket_start").collect()
      .map(r => (r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // hod 5 now averages (6 + 7) / 2 = 6.5
    assert(r5.toSeq == Seq((6L, 6.5, -0.5), (7L, 6.5, 0.5)))
  }

  test("lag-1 autocorrelation: affine series hit exactly ±1; gaps break pairs") {
    // counts ramp 1..10 across adjacent hours: next = prev + 1 -> r = 1
    val ramp = (for { b <- 0 until 10; _ <- 0 to b }
      yield ("up", b.toLong * 3600L))
    // counts alternate 5,10,5,10: next = 15 - prev -> r = -1
    val alt = (for { b <- 0 until 10; _ <- 0 until (if (b % 2 == 0) 5 else 10) }
      yield ("flip", b.toLong * 3600L))
    // a gap splits the chain: buckets 0,1 then 5,6 -> only 2 pairs
    val gap = (for { b <- Seq(0, 1, 5, 6); _ <- 0 to b }
      yield ("gap", b.toLong * 3600L))
    val got = TimeSeries.lag1Autocorr(
        (ramp ++ alt ++ gap).toDF("event_type", "sec"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got("up") == ((9L, Some(1.0))))
    assert(got("flip") == ((9L, Some(-1.0))))
    assert(got("gap")._1 == 2L)
  }

  test("freshness measures staleness against the data's own frontier") {
    val ev = Seq(("a", 100L), ("a", 500L), ("b", 450L), ("c", 500L))
      .toDF("event_type", "sec")
    val got = TimeSeries.freshness(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((100L, 500L, 2L, 0L)))
    assert(got("b") == ((450L, 450L, 1L, 50L)))
    assert(got("c") == ((500L, 500L, 1L, 0L)))
  }

  test("session-4 monitoring ops are partitioning-invariant") {
    val ev = Tables.events(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    for (op <- Seq[org.apache.spark.sql.DataFrame =>
                   org.apache.spark.sql.DataFrame](
        TimeSeries.rateAnomalies(_).orderBy("event_type", "bucket_start"),
        TimeSeries.seasonalDecompose(_).orderBy("event_type", "bucket_start"),
        TimeSeries.rateAnomaliesDeseasonalized(_)
          .orderBy("event_type", "bucket_start"),
        TimeSeries.changepoint(_).orderBy("event_type"))) {
      assert(rows(op(ev)) == rows(op(ev.repartition(7))))
    }
  }

  test("asof tolerance: stale clicks null out, fresh ones still match") {
    val ev = Seq(
      (1L, 10L, "click", 95L * 1000000),
      (1L, 11L, "purchase", 100L * 1000000),  // gap 5 s  -> match
      (1L, 12L, "purchase", 300L * 1000000),  // gap 205 s -> null
      (2L, 20L, "purchase", 50L * 1000000))   // no click at all
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val got = TimeSeries.asofNativeTolerance(ev, tolSec = 60L)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq == Seq(
      (11L, Some(10L), Some(5L)),
      (12L, None, None),
      (20L, None, None)))
  }

  test("forward asof picks the NEXT purchase, inclusive at same instant") {
    val ev = Seq(
      (1L, 10L, "click", 100L * 1000000),
      (1L, 11L, "purchase", 100L * 1000000),  // same instant -> matches
      (1L, 12L, "click", 150L * 1000000),
      (1L, 13L, "purchase", 220L * 1000000),  // next for click 12
      (2L, 20L, "click", 500L * 1000000))     // no purchase follows
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val got = TimeSeries.asofNextPurchase(ev)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq == Seq(
      (10L, Some(11L), Some(0L)),
      (12L, Some(13L), Some(70L)),
      (20L, None, None)))
  }

  test("changepoint lands on a step change; flat series peaks at the edge") {
    // 20 buckets at rate 5, then 20 at rate 15: the cut is bucket 19
    val ev = (for {
      b <- 0 until 40; _ <- 0 until (if (b < 20) 5 else 15)
    } yield ("click", b.toLong * 3600L)).toDF("event_type", "sec")
    val got = TimeSeries.changepoint(ev).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(5), r.getDouble(6)))
    // CUSUM peaks at the LAST bucket of the first regime
    assert(got.toSeq == Seq(("click", 19L * 3600L, 5.0, 15.0)))
    // a perfectly flat series has stat 0 everywhere -> earliest bucket
    val flat = (for { b <- 0 until 10; _ <- 0 until 7 }
      yield ("click", b.toLong * 3600L)).toDF("event_type", "sec")
    val f = TimeSeries.changepoint(flat).collect().head
    assert(f.getLong(1) == 0L && f.getLong(2) == 0L)
  }

  test("deseasonalized anomalies flag the off-cycle spike, not the cycle") {
    // three days of a strong daily ramp, one off-cycle spike on day 2
    val base = for {
      day <- 0 until 3; h <- 0 until 24; _ <- 0 until (h + 1) * 2
    } yield ("click", day * 86400L + h * 3600L)
    val spikeAt = 2 * 86400L + 3 * 3600L
    val ev = (base ++ Seq.fill(50)(("click", spikeAt)))
      .toDF("event_type", "sec")
    val deseason = TimeSeries.rateAnomaliesDeseasonalized(ev)
      .filter($"is_anomaly" === 1).collect().map(_.getLong(1)).toSet
    assert(deseason.contains(spikeAt), "the injected spike must flag")
    // the daily hard reset (hour 0's drop from hour 23) is cycle, not
    // anomaly, once deseasonalized — but the RAW gate flags it
    assert(!deseason.contains(86400L) && !deseason.contains(2 * 86400L))
    val raw = TimeSeries.rateAnomalies(ev)
      .filter($"is_anomaly" === 1).collect().map(_.getLong(1)).toSet
    assert(raw.contains(86400L),
      "raw counts must flag the cycle reset the residual gate ignores")
  }

  test("anomaly gate composes with micro-batch bucket maintenance") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val allEvents = ((0 until 10).flatMap(b => Seq.fill(10)(b.toLong * 60)) ++
      Seq.fill(100)(600L)).map(s => ("click", s))
    val input = MemoryStream[(String, Long)]
    // additive bucket counts maintained across batches (the upsert-
    // store stand-in); the full summary re-scores each batch
    val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
    val flags = scala.collection.mutable.Map.empty[(String, Long), Int]
    val q = input.toDF().toDF("event_type", "sec")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val counts = batch
          .groupBy(col("event_type"), expr("sec div 60 * 60").as("b"))
          .agg(count(lit(1)).as("n")).collect()
        acc.synchronized {
          counts.foreach { r =>
            val k = (r.getString(0), r.getLong(1))
            acc(k) = acc.getOrElse(k, 0L) + r.getLong(2)
          }
          val buckets = acc.toSeq.map { case ((t, b), n) => (t, b, n) }
            .toDF("event_type", "bucket_start", "n")
          flags.clear()
          TimeSeries.scoreBuckets(buckets, bucketSec = 60L).collect()
            .foreach(r => flags((r.getString(0), r.getLong(1))) = r.getInt(5))
        }
      }
      .start()
    try {
      // the spike bucket arrives SPLIT across two batches — only the
      // merged count crosses the threshold
      val (head, tail) = allEvents.splitAt(allEvents.length - 40)
      input.addData(head: _*)
      q.processAllAvailable()
      input.addData(tail: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batchFlags = TimeSeries
      .rateAnomalies(allEvents.toDF("event_type", "sec"), bucketSec = 60L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(5)).toMap
    // stream and batch planes agree exactly
    assert(flags.toMap == batchFlags)
    assert(flags(("click", 600L)) == 1)
  }

  test("M4 downsample keeps first/last/min/max per bucket, exact picks") {
    import spark.implicits._
    // 2 buckets over secs [0, 19]: sec 0-9 -> bucket 0, 10-19 -> 1
    val ev = (0 until 20).map { i =>
      (i.toLong, i.toLong * 1000000L, i.toLong,
        if (i == 3) -5.0 else if (i == 7) 99.0 else i.toDouble)
    }.toDF("event_id", "ts_us", "sec", "value")
    val got = TimeSeries.m4Downsample(ev, buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 10L, -5.0, 99.0, 0.0, 9.0),   // min@3, max@7, first=v(0), last=v(9)
      (1L, 10L, 10.0, 19.0, 10.0, 19.0)))
  }

  test("cepMatch: next-second semantics, negation, window bound, per-user isolation") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Long, String)], w: Long = 100L) =
      TimeSeries.cepMatch(
          rows.toDF("user_id", "event_id", "ts_us", "event_type"),
          "view", "purchase", "error", windowUs = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // plain match: view@10 → purchase@30 (gap 20); the SECOND purchase
    // @50 is not the match (first-after wins)
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 30L, "purchase"),
      (1L, 3L, 50L, "purchase"))) == Set((1L, 1L, 2L, 20L)))
    // an error BETWEEN kills the match
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 20L, "error"),
      (1L, 3L, 30L, "purchase"))).isEmpty)
    // an error AFTER the purchase does not
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 30L, "purchase"),
      (1L, 3L, 40L, "error"))) == Set((1L, 1L, 2L, 20L)))
    // outside the window: no match
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 300L, "purchase"))).isEmpty)
    // another user's error never interferes
    assert(run(Seq((1L, 1L, 10L, "view"), (2L, 9L, 20L, "error"),
      (1L, 2L, 30L, "purchase"))) == Set((1L, 1L, 2L, 20L)))
    // two views share the same next purchase (both match)
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 15L, "view"),
      (1L, 3L, 30L, "purchase"))) ==
      Set((1L, 1L, 3L, 20L), (1L, 2L, 3L, 15L)))
    // same-ts tie: order falls back to event_id, so purchase with a
    // LARGER id at the same ts still counts as "after"
    assert(run(Seq((1L, 1L, 10L, "view"), (1L, 2L, 10L, "purchase"))) ==
      Set((1L, 1L, 2L, 0L)))
  }

  test("cepMatch equals the brute-force scan on random event streams") {
    import spark.implicits._
    def brute(rows: Seq[(Long, Long, Long, String)],
              w: Long): Set[(Long, Long, Long, Long)] =
      rows.groupBy(_._1).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        sorted.indices.flatMap { i =>
          val (u, id, ts, t) = sorted(i)
          if (t != "view") None
          else {
            val rest = sorted.drop(i + 1)
            val bIdx = rest.indexWhere(_._4 == "purchase")
            if (bIdx < 0) None
            else {
              val (_, bid, bts, _) = rest(bIdx)
              val blocked = rest.take(bIdx).exists(_._4 == "error")
              if (bts <= ts + w && !blocked) Some((u, id, bid, bts - ts))
              else None
            }
          }
        }
      }.toSet
    val types = Array("view", "purchase", "error", "click")
    for (seed <- Seq(3, 27); parts <- Seq(1, 6)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 400L).map(id =>
        (rnd.nextInt(12).toLong, id, rnd.nextInt(200).toLong,
          types(rnd.nextInt(4))))
      val got = TimeSeries.cepMatch(
          rows.toDF("user_id", "event_id", "ts_us", "event_type")
            .repartition(parts),
          "view", "purchase", "error", windowUs = 60L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == brute(rows, 60L), s"seed $seed parts $parts")
    }
  }

  // ---- linear multi-touch attribution ----

  private def evRow(id: Long, user: Long, tsSec: Long, typ: String) =
    (id, user, tsSec * 1000000L, typ)

  private def attrib(rows: Seq[(Long, Long, Long, String)]) =
    graft.operators.TimeSeries.attribution(
      rows.toDF("event_id", "user_id", "ts_us", "event_type"),
      windowSec = 1800L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap

  test("attribution: equal split across touches, direct for untouched") {
    val rows = Seq(
      evRow(1, 1, 100, "click"), evRow(2, 1, 200, "view"),
      evRow(3, 1, 300, "purchase"),                      // 2 touches → ½ each
      evRow(4, 2, 100, "purchase"),                      // no touches → direct
      evRow(5, 3, 500, "click"), evRow(6, 3, 600, "purchase")) // 1 touch
    val got = attrib(rows)
    assert(got("click") == (2L, 1.5), "½ from user 1 + 1 from user 3")
    assert(got("view") == (1L, 0.5))
    assert(got("direct") == (1L, 1.0))
  }

  test("attribution: window boundary — exactly W counts, beyond W and ties do not") {
    val W = 1800L
    val rows = Seq(
      evRow(1, 1, 1000, "click"), evRow(2, 1, 1000 + W, "purchase"),  // = W: in
      evRow(3, 2, 1000, "click"), evRow(4, 2, 1001 + W, "purchase"),  // > W: out
      evRow(5, 3, 1000, "click"), evRow(6, 3, 1000, "purchase"))      // tie: out
    val got = attrib(rows)
    assert(got("click") == (1L, 1.0))
    assert(got("direct") == (2L, 2.0))
  }

  test("attribution: credit is conserved — totals equal the conversion count") {
    val rnd = new scala.util.Random(23)
    val types = Seq("click", "view", "signup", "purchase", "error")
    val rows = (1L to 600L).map(i =>
      evRow(i, rnd.nextInt(5).toLong, rnd.nextInt(40000).toLong,
        types(rnd.nextInt(types.length))))
    val got = attrib(rows)
    val nConv = rows.count(_._4 == "purchase")
    val total = got.values.map(_._2).sum
    assert(math.abs(total - nConv) < 1e-3,
      s"credit $total vs $nConv conversions (per-touch rounding only)")
  }

  test("attribution: cross-bin touches are found (bin-1 probe)") {
    // touch at 1799s, purchase at 1801s: different 1800s bins, gap 2s
    val rows = Seq(
      evRow(1, 1, 1799, "click"), evRow(2, 1, 1801, "purchase"))
    assert(attrib(rows)("click") == (1L, 1.0))
  }

  // ---- truncated EMA ----

  private def emaOf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    val df = rows.toDF("o_orderpriority", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp_ntz")).drop("d")
    TimeSeries.emaDaily(df).orderBy("o_orderpriority", "day_ms")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
  }

  test("emaDaily: leading-edge renormalization and the frozen-weight " +
       "arithmetic, hand-computed") {
    val got = emaOf(Seq(
      ("P", "1995-01-01 10:00:00", 100.00),   // two same-day orders sum
      ("P", "1995-01-01 11:00:00", 100.00),
      ("P", "1995-01-02 09:00:00", 100.00),
      ("P", "1995-01-03 09:00:00", 400.00)))
    // day1: 20000 cents, den=w0 -> ema = 20000
    // day2: (10000*250000 + 20000*187500) div 437500 = 14285
    // day3: (40000*250000 + 10000*187500 + 20000*140625)
    //        div 578125 = 25405
    assert(got.map(t => (t._2, t._3)).toSeq ==
      Seq((20000L, 20000L), (10000L, 14285L), (40000L, 25405L)))
  }

  test("emaDaily: the window is 16 lags — day 17 no longer sees " +
       "day 1, and series are independent") {
    // series A: a huge day-1 spike then 16 flat days; series B flat.
    // At row 17 the spike has aged out: ema == the flat value.
    val days = (1 to 17).map(i => f"1995-02-$i%02d 00:00:00")
    val a = days.zipWithIndex.map { case (d, i) =>
      ("A", d, if (i == 0) 1e6 else 50.0) }
    val b = days.map(d => ("B", d, 50.0))
    val got = emaOf(a ++ b)
    val aRows = got.filter(_._1 == "A")
    assert(aRows.last._3 == 5000L,
      s"day-1 spike must age out of the 16-lag frame: ${aRows.last}")
    assert(aRows(15)._3 > 5000L, "day 16 still sees the spike")
    assert(got.filter(_._1 == "B").forall(_._3 == 5000L))
  }
}

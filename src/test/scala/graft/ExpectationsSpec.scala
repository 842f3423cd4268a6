package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Rule

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("violation counts are exact and null predicate results violate") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "a"), (5L, "zz"), (-1L, "a"))
      .toDF("k", "tag")
    val rep = Expectations.report(df, Seq(
        Rule("k_positive", $"k" > 0L),          // null k -> null pred -> violation
        Rule("tag_domain", $"tag".isin("a", "b"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep("k_positive") == ((2L, 5L, 0.6)))   // null + (-1)
    assert(rep("tag_domain") == ((1L, 5L, 0.8)))   // "zz"
  }

  test("uniqueness rule counts duplicate keys via the same single pass") {
    val df = Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1), (2L, 1))
      .toDF("k", "sub")
    val rep = Expectations.report(df,
        Seq(Rule("k_nonneg", $"k" >= 0)),
        uniqueKey = Some(("pk_unique", Seq($"k" * 10 + $"sub"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("pk_unique") == 2L) // 5 rows, 3 distinct (k,sub)
    assert(rep("k_nonneg") == 0L)
  }

  test("the whole report is one aggregate: a single scan of the input") {
    val rep = Expectations.lineitemSuite(
      Tables.lineitem(spark, sf("sf0.001")))
    // count logical relations (the executed plan hides behind the AQE
    // leaf before materialization)
    val scans = rep.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1, s"expected one scan, got:\n${rep.queryExecution}")
    val rows = rep.collect()
    assert(rows.length == 9)
    // all domain rules hold on the generated data; pk duplicates exist
    val byRule = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRule("returnflag_domain") == 0L)
    assert(byRule("pk_unique") > 0L)
  }

  test("drift is zero on identical snapshots, 2 on disjoint supports") {
    val a = Seq(1.0, 2.0, 3.0, 11.0, 12.0).toDF("v")
    val same = Expectations.histogramDrift(a, a, col("v"), 10.0)
      .agg(sum($"contrib8")).head().getDouble(0)
    assert(same == 0.0)
    val b = Seq(21.0, 22.0, 35.0).toDF("v")
    val disjoint = Expectations.histogramDrift(a, b, col("v"), 10.0)
      .agg(sum($"contrib8")).head().getDouble(0)
    // triangular discrimination hits its upper bound 2 when the
    // supports never overlap
    assert(math.abs(disjoint - 2.0) < 1e-6)
  }

  test("drift localizes: only the shifted bin contributes") {
    val ref = Seq(1.0, 2.0, 11.0, 12.0).toDF("v")
    val cur = Seq(1.0, 2.0, 11.0, 21.0).toDF("v")
    val rows = Expectations.histogramDrift(ref, cur, col("v"), 10.0)
      .orderBy("bin").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(0L) == 0.0)        // both sides: 2 of 4
    assert(rows(1L) > 0.0)         // 2/4 vs 1/4
    assert(rows(2L) > 0.0)         // 0 vs 1/4
  }

  test("segmented drift is independent per segment, incl. one-sided ones") {
    val ref = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("c", 5.0))
      .toDF("s", "v")
    val cur = Seq(("a", 1.0), ("a", 2.0), ("b", 11.0)).toDF("s", "v")
    val bySeg = Expectations.histogramDriftBy(ref, cur, col("s"), col("v"), 10.0)
      .groupBy("seg").agg(sum($"contrib8").as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bySeg("a") == 0.0)                    // identical shape
    assert(math.abs(bySeg("b") - 2.0) < 1e-6)    // disjoint bins
    assert(math.abs(bySeg("c") - 1.0) < 1e-6)    // one-sided: sum(pr) = 1
  }

  test("drift composes with streaming: each micro-batch vs a static reference") {
    val ref = Seq(1.0, 2.0, 11.0, 12.0).toDF("v")
    val input = MemoryStream[Double](spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = input.toDS().toDF("v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val total = Expectations.histogramDrift(ref, batch, col("v"), 10.0)
          .agg(sum(col("contrib8"))).head().getDouble(0)
        seen.synchronized { seen += ((id, total)) }
        ()
      }
      .start()
    try {
      input.addData(1.0, 2.0, 11.0, 12.0) // same shape -> zero drift
      q.processAllAvailable()
      input.addData(21.0, 22.0)           // disjoint -> max drift 2
      q.processAllAvailable()
      val byBatch = seen.synchronized(seen.toList).toMap
      assert(byBatch(0L) == 0.0)
      assert(math.abs(byBatch(1L) - 2.0) < 1e-6)
    } finally q.stop()
  }

  test("the gate composes with streaming: per-micro-batch quality report") {
    // the standard deploy shape: Expectations.report inside
    // foreachBatch gates each ingest micro-batch before it lands
    val input = MemoryStream[(Long, String)](spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDS().toDF("k", "tag")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rep = Expectations.report(batch,
          Seq(Rule("k_positive", col("k") > 0L))).collect()(0)
        seen.synchronized { seen += ((id, rep.getLong(1), rep.getLong(2))) }
        ()
      }
      .start()
    try {
      input.addData((1L, "a"), (-2L, "b"), (3L, "c"))
      q.processAllAvailable()
      input.addData((4L, "d"))
      q.processAllAvailable()
      val byBatch = seen.synchronized(seen.toList).map {
        case (id, v, t) => id -> ((v, t))
      }.toMap
      assert(byBatch(0L) == ((1L, 3L))) // -2 violates in batch 0
      assert(byBatch(1L) == ((0L, 1L)))
    } finally q.stop()
  }

  test("MAD outlier gate is robust to the outlier itself; mad=0 degenerates") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "v")
    val got = Expectations.madOutliers(df, $"g", $"v").orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    // group a: median 3, mad 1 — the 100 cannot drag the threshold the
    // way it would drag mean/stddev (z-score would flag nothing: the
    // stddev itself is ~43); only 100 crosses 3 +/- 4.4478
    assert(got(0) == (("a", 5L, 3.0, 1.0, 1L, 0.2)))
    // group b: over half identical -> mad 0 -> any deviation flags
    assert(got(1) == (("b", 4L, 5.0, 0.0, 1L, 0.25)))
  }

  test("MAD outlier gate broadcasts the per-group stats, never the rows") {
    val rep = Expectations.orderPriceOutliers(
      Tables.orders(spark, sf("sf0.001")))
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"),
      s"expected broadcast joins of the stat tables:\n$plan")
    assert(rep.collect().length == 5) // one row per priority
  }

  test("referentialAudit: orphans and null keys partition the defect space") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(3L), Some(8L))
      .toDF("fk")
    val clean = Seq(Some(2L), Some(2L)).toDF("fk2")
    val got = Expectations.referentialAudit(Seq(
        ("dirty", child, "fk", parent, "pk"),
        ("clean", clean, "fk2", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("dirty") == (6L, 2L, 1L),
      "6 children: orphans {9, 8}, one null key — counted apart")
    assert(got("clean") == (2L, 0L, 0L))
  }

  test("referentialAudit: duplicate parent keys don't double-count matches") {
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup parent rows
    val child = Seq(1L, 1L, 2L, 5L).map(Option(_)).toDF("fk")
    val got = Expectations.referentialAudit(
        Seq(("e", child, "fk", parent, "pk")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((4L, 1L, 0L)),
      "only 5 is an orphan; the parent-side distinct prevents inflation")
  }

  test("uniquenessAudit detects injected duplicates and their multiplicity") {
    val clean = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val dirty = Seq((1L, "a"), (1L, "x"), (1L, "y"), (2L, "b"))
      .toDF("k", "v")
    val got = Expectations.uniquenessAudit(Seq(
        ("clean", clean, Seq("k")), ("dirty", dirty, Seq("k"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("clean") == (3L, 3L, 0L, 1L))
    assert(got("dirty") == (4L, 2L, 1L, 3L),
      "one duplicated key, worst multiplicity 3")
  }

  test("uniquenessAudit: composite key dedups on the FULL key") {
    // (1, x) twice is a dup; (1, y) sharing only the first column is not
    val t = Seq((1L, "x"), (1L, "x"), (1L, "y")).toDF("a", "b")
    val comp = Expectations.uniquenessAudit(Seq(("t", t, Seq("a", "b"))))
      .head()
    assert((comp.getLong(1), comp.getLong(2), comp.getLong(3),
      comp.getLong(4)) == (3L, 2L, 1L, 2L))
    val single = Expectations.uniquenessAudit(Seq(("t", t, Seq("a"))))
      .head()
    assert(single.getLong(3) == 1L && single.getLong(4) == 3L,
      "keyed on the first column alone, all three rows collide")
  }

  test("ksDrift: identical samples give D = 0, disjoint samples give 1") {
    val a = (1 to 50).map(_.toDouble).toDF("v")
    assert(Expectations.ksDrift(a, a, "v").head().getLong(2) == 0L)
    val lo = (1 to 40).map(_.toDouble).toDF("v")
    val hi = (100 to 129).map(_.toDouble).toDF("v")
    val r = Expectations.ksDrift(lo, hi, "v").head()
    assert(r.getLong(2) == 40L * 30L && r.getDouble(3) == 1.0,
      "fully separated distributions reach the KS maximum")
  }

  test("ksDrift: hand-computed ECDF gap, ties collapse per distinct value") {
    // A = {1,1,2,3} (n=4), B = {2,3,3,4} (m=4):
    //   v=1: ca=2 cb=0 → |8−0|=8;  v=2: ca=3 cb=1 → |12−4|=8
    //   v=3: ca=4 cb=3 → |16−12|=4; v=4: ca=4 cb=4 → 0   ⇒ D=8/16
    val a = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.0, 4.0).toDF("v")
    val r = Expectations.ksDrift(a, b, "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 4L, 8L))
    assert(r.getDouble(3) == 0.5)
  }

  test("ksDrift: partitioning invariance of the two-pass prefix sum") {
    val rnd = new scala.util.Random(17)
    val a = (1 to 500).map(_ => rnd.nextInt(80).toDouble).toDF("v")
    val b = (1 to 400).map(_ => rnd.nextInt(80).toDouble + 3.0).toDF("v")
    val one = Expectations.ksDrift(a.repartition(1), b.repartition(1), "v")
      .head()
    val many = Expectations.ksDrift(a.repartition(7), b.repartition(5), "v")
      .head()
    assert(one.getLong(2) == many.getLong(2) &&
      one.getDouble(3) == many.getDouble(3))
    assert(one.getLong(2) > 0L, "the +3 shift must register as drift")
  }

  test("ksDrift: NULL values are excluded from both samples") {
    // nulls would inflate n/m and enter the ECDF prefix at an
    // ENGINE-DEPENDENT position (Spark nulls-first vs DuckDB
    // nulls-last) — the contract is non-null-only (ADVICE r9)
    val a = Seq[java.lang.Double](1.0, 2.0, null, 3.0, null).toDF("v")
    val b = Seq[java.lang.Double](1.0, null, 2.0, 3.0).toDF("v")
    val r = Expectations.ksDrift(a, b, "v").head()
    assert((r.getLong(0), r.getLong(1)) == (3L, 3L),
      "n and m count non-null rows only")
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0,
      "the non-null parts are identical distributions")
  }

  test("benfordAudit: hand-computed digit ppm, absent digits report zero") {
    // cents first digits: 1 ×4, 2 ×3, 9 ×1 over 8 rows (zero and
    // negative amounts excluded) → obs ppm are floor(n·1e6/8)
    val amounts = Seq(1.00, 1.50, 19.99, 100.00, 0.25, 2.50, 25.00,
      -3.00, 0.0, 9.00).toDF("v")
    val got = Expectations.benfordAudit(amounts, "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (4L, 500000L))
    assert(got(2L) == (3L, 375000L), "0.25 → 25 cents → digit 2")
    assert(got(9L) == (1L, 125000L))
    assert(got.size == 9 && Seq(3L, 4L, 5L, 6L, 7L, 8L).forall(d =>
      got(d) == (0L, 0L)), "every digit 1-9 reports, zeros included")
    // expected ppm are the frozen Benford constants
    val exp = Expectations.benfordAudit(amounts, "v").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exp(1L) == 301029L && exp(9L) == 45757L)
  }

  test("benfordAudit: empty and all-nonpositive inputs yield 9 zero rows") {
    val none = Seq(-1.0, 0.0).toDF("v")
    val got = Expectations.benfordAudit(none, "v").collect()
    assert(got.length == 9)
    assert(got.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("uniquenessAudit: an empty table reports zeros, not nulls") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val r = Expectations.uniquenessAudit(Seq(("e", empty, Seq("k")))).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (0L, 0L, 0L, 0L))
  }

  test("classBalance: hand-computed gini/majority, the stated " +
       "one-floor-at-the-end form") {
    // seg s1: a×3, b×1 -> n=4, gini = (16-10)*1e6 // 16 = 375000,
    //   majority a at 3*1e6 // 4 = 750000
    // seg s2: pure -> gini 0, majority 1e6
    val df = Seq(("s1", "a"), ("s1", "a"), ("s1", "a"), ("s1", "b"),
        ("s2", "z"), ("s2", "z"))
      .toDF("src", "lbl")
    val got = Expectations.classBalance(df, "src", "lbl")
      .orderBy("segment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("s1", 4L, 2L, "a", 750000L, 375000L),
      ("s2", 2L, 1L, "z", 1000000L, 0L)))
  }

  test("classBalance: majority count-ties break to the " +
       "lexicographically larger label, any partitioning") {
    val df = Seq(("s", "aa"), ("s", "bb")).toDF("src", "lbl")
    val r = Expectations.classBalance(df.repartition(5), "src", "lbl").head()
    assert(r.getString(3) == "bb" && r.getLong(4) == 500000L &&
      r.getLong(5) == 500000L)
  }

  test("classBalance rides decimal past the 2^53 envelope: a " +
       "simulated giant segment stays exact") {
    // 3 classes of n = 50 000: total 150 000, whose square
    // (2.25e10) exceeds 2^31 — past int32 and into the range where
    // the decimal (not long-double) path must carry the ppm
    // arithmetic; verify the exact ppm identity there
    val n = 50000L
    val df = spark.range(3 * n).selectExpr("'g' AS src",
      "CAST(id % 3 AS STRING) AS lbl")
    val r = Expectations.classBalance(df, "src", "lbl").head()
    // perfectly balanced 3 classes: gini = (9n²−3n²)·1e6 // 9n² ->
    // exactly 2/3 in ppm, floored
    assert(r.getLong(5) == 666666L && r.getLong(4) == 333333L)
  }

  private def assocRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("feature", "label").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5), r.getLong(6))).toSeq

  test("labelAssociation: hand-computed chi-square cells — perfect " +
       "anti-association, every division one floor at the end") {
    // a: 8×x + 2×y, b: 2×x + 8×y — N=20, n_x=n_y=10, n_a=n_b=10
    // E(every cell) = 10·10/20 = 5 → e_ppm 5 000 000
    // contrib(every cell) = (O·20 − 100)²·10⁶ // (20·10·10)
    //   O=8: 60² ·10⁶ // 2000 = 1 800 000 (= (8−5)²/5 = 1.8 exactly)
    //   O=2: (−60)² — same by symmetry
    // χ²·10⁶ = 4 × 1.8e6 = 7 200 000 (true χ² = 7.2)
    val df = (Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(8)(("b", "y")))
      .toDF("f", "l")
    val got = assocRows(Expectations.labelAssociation(df, "f", "l"))
    assert(got == Seq(
      ("a", "x", 8L, 5000000L, 1800000L),
      ("a", "y", 2L, 5000000L, 1800000L),
      ("b", "x", 2L, 5000000L, 1800000L),
      ("b", "y", 8L, 5000000L, 1800000L)))
  }

  test("labelAssociation: independent features contribute zero; " +
       "floors match the deferred-division form") {
    // a: 4×x + 6×y, b: 2×x + 3×y — exact independence (same 2:3 mix)
    val ind = (Seq.fill(4)(("a", "x")) ++ Seq.fill(6)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(3)(("b", "y"))).toDF("f", "l")
    assert(assocRows(Expectations.labelAssociation(ind, "f", "l"))
      .forall(_._5 == 0L), "independence ⇒ zero contribution")
    // floor case: a:{x:1, y:2}, b:{x:1} — E(a,x) = 3·2/4 = 1.5,
    // contrib(a,x) = (1·4 − 6)²·10⁶ // (4·3·2) = 4e6 // 24 = 166 666
    val fl = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("b", "x"))
      .toDF("f", "l")
    val got = assocRows(Expectations.labelAssociation(fl, "f", "l"))
    assert(got.find(t => t._1 == "a" && t._2 == "x").get ==
      ("a", "x", 1L, 1500000L, 166666L))
  }

  test("labelAssociation: a NEVER-observed cell surfaces with " +
       "n_obs = 0 and contributes its expectation") {
    // label y never appears under b — the leakage shape a
    // present-cells-only table would hide. contrib(b,y) =
    // (0·N − n_b·n_y)²·10⁶ // (N·n_b·n_y) = n_b·n_y·10⁶ // N = E·10⁶
    val df = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(4)(("b", "x"))).toDF("f", "l")
    // N=8, n_b=4, n_y=2: E(b,y) = 1 → e_ppm = contrib = 1 000 000
    val by = assocRows(Expectations.labelAssociation(df, "f", "l"))
      .find(t => t._1 == "b" && t._2 == "y").get
    assert(by == ("b", "y", 0L, 1000000L, 1000000L))
  }

  test("labelAssociation state is maintainable: cell counts folded " +
       "over micro-batches + the epilogue == the recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, String)](spark)
    var cells = Seq.empty[(String, String, Long)]
      .toDF("feature", "label", "n_obs").localCheckpoint()
    val q = input.toDF().toDF("f", "l")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // counts merge by addition — the aggDelta law applied to the
        // contingency table; only the vocabulary-sized cells persist
        cells = cells.unionByName(
            batch.groupBy(col("f").as("feature"), col("l").as("label"))
              .agg(count(lit(1)).as("n_obs")))
          .groupBy("feature", "label")
          .agg(sum("n_obs").as("n_obs"))
          .localCheckpoint()
        ()
      }.start()
    try {
      input.addData(("a", "x"), ("a", "x"), ("b", "y"))
      q.processAllAvailable()
      input.addData(("a", "y"), ("b", "y"), ("b", "x"), ("a", "x"))
      q.processAllAvailable()
    } finally q.stop()
    val all = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("a", "y"),
      ("b", "y"), ("b", "x"), ("a", "x")).toDF("f", "l")
    assert(
      assocRows(Expectations.labelAssociationFromCells(cells)) ==
        assocRows(Expectations.labelAssociation(all, "f", "l")),
      "fold-then-epilogue must equal the from-scratch audit")
  }

  test("chi2Ppm aggregate == sum(contrib_ppm) of the relational " +
       "epilogue, bit for bit — skewed, independent, and single-cell") {
    val fixtures = Seq(
      // perfectly anti-associated (the leakage shape)
      (1 to 40).map(i => (s"f${i % 2}", s"l${i % 2}")),
      // independent-ish mix
      (1 to 60).map(i => (s"f${i % 3}", s"l${i % 2}")),
      // one cell only (χ² = 0 by construction)
      (1 to 7).map(_ => ("f", "l")))
    for ((rows, i) <- fixtures.zipWithIndex) {
      val df = rows.toDF("f", "l")
      val viaAgg = df.agg(
        Expectations.chi2Ppm(col("f"), col("l")).as("chi2"))
        .head().getLong(0)
      val viaRel = Expectations.labelAssociation(df, "f", "l")
        .agg(sum("contrib_ppm").cast("long")).head().getLong(0)
      assert(viaAgg == viaRel, s"fixture $i: $viaAgg vs $viaRel")
    }
    // grouped use: one χ² per segment, same equality per group
    val seg = (1 to 30).map(i =>
      (s"s${i % 2}", s"f${i % 3}", s"l${(i / 2) % 2}")).toDF("s", "f", "l")
    val byAgg = seg.groupBy("s")
      .agg(Expectations.chi2Ppm(col("f"), col("l")).as("chi2"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (s <- Seq("s0", "s1")) {
      val rel = Expectations.labelAssociation(
          seg.filter(col("s") === s), "f", "l")
        .agg(sum("contrib_ppm").cast("long")).head().getLong(0)
      assert(byAgg(s) == rel, s"segment $s")
    }
  }

  test("labelAssociation guards its exactness envelope: n_tot past " +
       "3e7 RAISES (never a silent decimal-overflow NULL)") {
    // synthetic cells, so the envelope trips without 3e7 fact rows
    val cells = Seq(("a", "x", 25000000L), ("b", "y", 20000000L))
      .toDF("feature", "label", "n_obs")
    val e = intercept[Exception] {
      Expectations.labelAssociationFromCells(cells).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("integer-exact envelope")),
      s"expected the envelope message, got: ${msgs(e)}")
    // and just inside the envelope it still answers
    val ok = Seq(("a", "x", 15000000L), ("b", "y", 15000000L))
      .toDF("feature", "label", "n_obs")
    assert(Expectations.labelAssociationFromCells(ok).count() == 4L)
  }

  test("labelAssociation: an EMPTY audit is an empty DataFrame, not " +
       "a misfiring envelope error (sum over no rows is NULL)") {
    val empty = Seq.empty[(String, String, Long)]
      .toDF("feature", "label", "n_obs")
    assert(Expectations.labelAssociationFromCells(empty).count() == 0L)
  }
}

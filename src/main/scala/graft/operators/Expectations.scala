package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate every
  * large ingest pipeline runs before data is allowed into training
  * (null rates, domains, ranges, key uniqueness), in the style of the
  * public expectation frameworks (Great Expectations' suite shape,
  * Deequ's `VerificationSuite`).
  *
  * The whole report is ONE aggregation pass over the table: each rule
  * becomes a conditional-sum column in a single `agg`, so violations
  * for any number of rules cost one scan with map-side partial
  * aggregation — never one job per rule. The per-rule rows are then
  * unpivoted from the single aggregate row with `stack` (a few dozen
  * values on one row — free). An optional primary-key uniqueness
  * check rides the same pass as an exact `count(DISTINCT ...)`;
  * Catalyst plans the mixed distinct/non-distinct aggregate with one
  * Expand, still a single scan.
  *
  * At 100 TB this is the only viable shape: rule evaluation is
  * embarrassingly parallel per row, the shuffle carries one partial
  * row per partition, and adding a rule adds a column, not a job.
  */
object Expectations {

  /** A named expectation: `holds` must be a boolean Column that is
    * true when the ROW SATISFIES the rule. Null predicate results
    * count as violations (unknown fails the gate). */
  final case class Rule(name: String, holds: Column)

  /** One row per rule: (rule, violations, total, pass_rate∈[0,1]).
    * `uniqueKey`, when given, appends a `<name>` uniqueness rule
    * whose violation count is total − count(distinct key). */
  def report(df: DataFrame, rules: Seq[Rule],
             uniqueKey: Option[(String, Seq[Column])] = None): DataFrame = {
    require(rules.nonEmpty, "Expectations.report needs at least one rule")
    // coalesce(0): sum over an EMPTY table is null, and an empty
    // ingest batch must read "0 violations", not null
    val ruleAggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(
        sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"_v$i")
    }
    val uniqAgg = uniqueKey.toSeq.map { case (_, cols) =>
      countDistinct(cols.head, cols.tail: _*).as("_uniq")
    }
    val aggs = count(lit(1)).as("_total") +: (ruleAggs ++ uniqAgg)
    val one = df.agg(aggs.head, aggs.tail: _*)

    val pairs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name.replace("'", "''")}', _v$i"
    } ++ uniqueKey.map { case (n, _) =>
      s"'${n.replace("'", "''")}', _total - _uniq"
    }
    one
      .select(col("_total"),
        expr(s"stack(${pairs.length}, ${pairs.mkString(", ")})")
          .as(Seq("rule", "violations")))
      .select(
        col("rule"),
        col("violations"),
        col("_total").as("total"),
        // an empty batch passes vacuously (and ANSI mode makes 0/0 an
        // ERROR, not a NaN — the guard is required, not cosmetic)
        when(col("_total") === 0L, 1.0)
          .otherwise(round(lit(1.0) - col("violations").cast("double") /
            col("_total"), 6)).as("pass_rate"))
  }

  /** Distribution drift between a reference and a current snapshot of
    * one numeric column — the monitoring counterpart of [[report]]
    * (PSI-style dashboards in the public monitoring stacks; Lin 1991's
    * triangular discrimination as the statistic).
    *
    * Values are binned to `binWidth`; each side reduces to (bin, n)
    * counts — the exchange carries bins, never rows, exactly like the
    * histogram-quantile sketch. The per-bin contribution is
    *
    *   (p_ref − p_cur)² / (p_ref + p_cur)
    *
    * — the SYMMETRIC chi-square (triangular discrimination): bounded
    * [0, 2], zero iff the binned distributions agree, and — unlike
    * PSI/KL — entirely rational arithmetic: no log/exp, so every term
    * is bit-identical on any engine (libm-free per the Portable
    * convention). Totals ride 1-row broadcasts; per-bin output keeps
    * the statistic attributable (which bins drifted), the scalar is
    * one tiny agg away. */
  def histogramDrift(ref: DataFrame, cur: DataFrame, value: Column,
                     binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, n: String): DataFrame =
      df.groupBy(floor(value / binWidth).cast("long").as("bin"))
        .agg(count(lit(1)).as(n))
    val r = binned(ref, "ref_n")
    val c = binned(cur, "cur_n")
    val joined = r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      sum(col("ref_n")).as("ref_total"), sum(col("cur_n")).as("cur_total"))
    val pr = col("ref_n").cast("double") / col("ref_total")
    val pc = col("cur_n").cast("double") / col("cur_total")
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(
          when(pr + pc === 0.0, 0.0)
            .otherwise((pr - pc) * (pr - pc) / (pr + pc)), 8)
          .as("contrib8"))
  }

  /** The shipped expectation suite over `lineitem` — the battery a
    * TPC-H-shaped ingest would gate on. Violation counts are real
    * (the synthetic generator is allowed to produce out-of-domain
    * rows); the point is the exact counts, not zero counts. */
  def lineitemSuite(lineitem: DataFrame): DataFrame =
    report(
      lineitem,
      Seq(
        Rule("quantity_in_1_50",
          col("l_quantity") >= 1 && col("l_quantity") <= 50),
        Rule("discount_in_0_10pct",
          col("l_discount") >= 0.0 && col("l_discount") <= 0.10),
        Rule("tax_in_0_8pct", col("l_tax") >= 0.0 && col("l_tax") <= 0.08),
        Rule("price_positive", col("l_extendedprice") > 0.0),
        Rule("returnflag_domain", col("l_returnflag").isin("A", "N", "R")),
        Rule("linestatus_domain", col("l_linestatus").isin("O", "F")),
        Rule("shipdate_not_null", col("l_shipdate").isNotNull),
        Rule("orderkey_positive", col("l_orderkey") > 0L)),
      // single combined expression (linenumber < 10), not a column
      // tuple: multi-arg COUNT(DISTINCT a, b) drops null-containing
      // tuples in Spark but not everywhere — one expression has one
      // semantics on every engine
      uniqueKey = Some(("pk_unique",
        Seq(col("l_orderkey") * 10 + col("l_linenumber")))))

  /** [[histogramDrift]] per segment: drift computed INDEPENDENTLY
    * within each value of `seg` — the dashboard query that localizes
    * "the corpus drifted" to "the `web` source drifted". Same plan
    * economics with the segment riding every key: (seg, bin) counts,
    * one full-outer join, per-seg totals via a window over the BIN
    * table (bins × segments rows, never input rows). */
  def histogramDriftBy(ref: DataFrame, cur: DataFrame, seg: Column,
                       value: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, n: String): DataFrame =
      df.groupBy(seg.as("seg"),
          floor(value / binWidth).cast("long").as("bin"))
        .agg(count(lit(1)).as(n))
    val joined = binned(ref, "ref_n")
      .join(binned(cur, "cur_n"), Seq("seg", "bin"), "full_outer")
      .select(col("seg"), col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
    val rt = sum(col("ref_n")).over(w)
    val ct = sum(col("cur_n")).over(w)
    // a segment entirely absent from one snapshot has total 0 there:
    // its proportions are 0 by definition, not a division error
    val pr = when(rt === 0L, 0.0)
      .otherwise(col("ref_n").cast("double") / rt)
    val pc = when(ct === 0L, 0.0)
      .otherwise(col("cur_n").cast("double") / ct)
    joined.select(col("seg"), col("bin"), col("ref_n"), col("cur_n"),
      round(
        when(pr + pc === 0.0, 0.0)
          .otherwise((pr - pc) * (pr - pc) / (pr + pc)), 8)
        .as("contrib8"))
  }

  /** Shipped drift check: even- vs odd-orderkey order-price
    * distributions (a deterministic stand-in for "last week vs this
    * week"). Even/odd split via divisibility (`=== 0` / `=!= 0`), not
    * remainder equality — the sign convention of `%` on negative keys
    * differs across engines, divisibility does not. */
  def orderPriceDrift(orders: DataFrame,
                      binWidth: Double = 50000.0): DataFrame =
    histogramDrift(
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0),
      orders.filter(pmod(col("o_orderkey"), lit(2)) =!= 0),
      col("o_totalprice"), binWidth)

  /** Shipped per-segment drift: the same even/odd split, localized by
    * order priority. */
  def orderPriceDriftBySegment(orders: DataFrame,
                               binWidth: Double = 50000.0): DataFrame =
    histogramDriftBy(
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0),
      orders.filter(pmod(col("o_orderkey"), lit(2)) =!= 0),
      col("o_orderpriority"), col("o_totalprice"), binWidth)

  /** Robust per-group outlier gate: median/MAD instead of mean/stddev
    * (Hampel's rule; Leys et al. 2013, "Detecting outliers: do not
    * use standard deviation around the mean") — a handful of extreme
    * rows cannot drag the threshold the way they drag a z-score. A
    * row is an outlier when |x − median| > mad × `cutoff`, with
    * cutoff = 3σ-equivalent 4.4478 (= 3 × 1.4826, the normal
    * consistency constant) folded into ONE literal so both engines
    * evaluate a single multiply — no associativity ambiguity. Groups
    * with mad = 0 (over half the values identical) flag any deviation
    * from the median, the standard Hampel degeneration.
    *
    * Plan shape: two exact-percentile aggregations (each one shuffle
    * on the group key, map-side combinable) and two BROADCAST joins
    * of the tiny per-group stat tables back onto the rows — group
    * cardinality is bounded by the domain, never by the data, so at
    * 100 TB the broadcast side stays a few rows and the row side is
    * scanned, never shuffled, for the flagging pass. */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  cutoff: Double = 4.4478): DataFrame = {
    val x = value.cast("double")
    val med = df
      .groupBy(group.as("grp"))
      .agg(percentile(x, lit(0.5)).as("med"))
    val mad = df
      .join(broadcast(med), group === col("grp"))
      .groupBy(col("grp"))
      .agg(
        percentile(abs(x - col("med")), lit(0.5)).as("mad"),
        max(col("med")).as("med"))
    df.join(broadcast(mad), group === col("grp"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        max(round(col("med"), 4)).as("median4"),
        max(round(col("mad"), 4)).as("mad4"),
        sum(when(abs(x - col("med")) > col("mad") * cutoff, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("grp"), col("n"), col("median4"), col("mad4"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n"), 6)
          .as("outlier_frac"))
  }

  /** Shipped robust-outlier gate: order prices by priority. The demo
    * column is uniform-ish (max |x − median| ≈ 2 MAD), so the Hampel
    * 3σ default would flag nothing; 1.8 exercises the flagging path
    * (~10% mild outliers) while the default stays the textbook rule. */
  def orderPriceOutliers(orders: DataFrame): DataFrame =
    madOutliers(orders, col("o_orderpriority"), col("o_totalprice"),
      cutoff = 1.8)

  /** Referential-integrity audit across a set of foreign-key edges:
    * for each (name, child, childKey, parent, parentKey) returns
    * (relationship, n_child, n_orphans, n_null_keys) — orphans are
    * non-null child keys absent from the parent, the anti-join audit
    * every warehouse load gate runs. NULL child keys are counted
    * separately (a null FK is a different defect than a dangling
    * one), and excluded from the orphan anti-join so the two numbers
    * partition the defect space.
    *
    * Scale shape: one left_anti join per edge, keyed on the FK.
    * Dimension parents broadcast (AQE sizes them); fact-to-fact
    * edges (lineitem→orders) shuffle both sides on the key — the
    * correct distribution, and the ONLY per-edge exchange since both
    * counts fold into the same single-row aggregate. The edges
    * evaluate as one unioned plan, not driver-side loops over
    * actions. */
  def referentialAudit(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    edges.map { case (name, child, ck, parent, pk) =>
      val keys = child.select(col(ck).as("k"))
      val nonNull = keys.filter(col("k").isNotNull)
      val orphans = nonNull.join(
        parent.select(col(pk).as("k")).distinct(), Seq("k"), "left_anti")
      keys.agg(count(lit(1)).as("n_child"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"), coalesce(col("n_null_keys"), lit(0L))
            .as("n_null_keys"))
    }.reduce(_ unionByName _)

  /** Exact two-sample Kolmogorov–Smirnov statistic — distribution
    * drift measured RIGHT: D = sup |ECDF_a − ECDF_b|, computed as an
    * integer (max |ca·m − cb·n| over distinct values, divided by n·m
    * only at the read edge) so the answer is exact and
    * engine-portable, where the binned chi-square-style drift report
    * ([[orderPriceDrift]]) quantizes first and answers "did the bins
    * move". Returns one row: (n, m, d_num, ks6).
    *
    * Distributed shape (the [[graft.operators.Sampling.budgetSelect]]
    * two-pass prefix sum): per-value (na, nb) counts in one exchange,
    * range-repartition by value, per-partition subtotals to the
    * driver (one Int pair per partition), broadcast offsets back, and
    * a running-max inside each partition — no single-partition global
    * window anywhere. The partition id is FROZEN as a column at
    * checkpoint time (never TaskContext at pass 2 — the DetCheck
    * lesson). d_num ≤ n·m: keep both sides under ~9.4e7 rows per
    * comparison (2^53 portability) — sample-gate above that.
    *
    * NULL contract: rows with a NULL `valueCol` are EXCLUDED from
    * both samples (n and m count non-null rows only). KS over nulls
    * is statistically undefined, and engines disagree on null sort
    * position (Spark nulls-first vs DuckDB nulls-last), so admitting
    * them would make the ECDF prefix engine-dependent. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val cv = col(valueCol).cast("double")
    val tagged = a.select(cv.as("v"), lit(1L).as("na"), lit(0L).as("nb"))
      .filter(col("v").isNotNull)
      .unionByName(b.select(cv.as("v"), lit(0L).as("na"), lit(1L).as("nb"))
        .filter(col("v").isNotNull))
    val perV = tagged.groupBy(col("v"))
      .agg(sum(col("na")).as("na"), sum(col("nb")).as("nb"))
      .repartitionByRange(col("v"))
      .sortWithinPartitions(col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
      .as[(Double, Long, Long, Int)]
    val nParts = perV.rdd.getNumPartitions
    val byPid = perV.groupBy(col("pid"))
      .agg(sum(col("na")).as("a"), sum(col("nb")).as("b"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val subtotals = (0 until nParts).map(byPid.getOrElse(_, (0L, 0L)))
    val n = subtotals.map(_._1).sum
    val m = subtotals.map(_._2).sum
    val offsets = spark.sparkContext.broadcast(
      subtotals.scanLeft((0L, 0L)) { case ((x1, y1), (x2, y2)) =>
        (x1 + x2, y1 + y2)
      }.toArray)
    val dnum = perV.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        var (ca, cb) = offsets.value(buf.head._4)
        var best = 0L
        buf.foreach { case (_, na, nb, _) =>
          ca += na; cb += nb
          val d = math.abs(ca * m - cb * n)
          if (d > best) best = d
        }
        Iterator.single(best)
      }
    }.toDF("d").agg(coalesce(max(col("d")), lit(0L)).as("d_num"))
    dnum.select(lit(n).as("n"), lit(m).as("m"), col("d_num"),
      when(lit(n * m) === 0L, lit(0.0))
        .otherwise(round(col("d_num") / lit(n.toDouble * m), 6)).as("ks6"))
  }

  /** Primary-key uniqueness audit — [[referentialAudit]]'s sibling
    * load gate: per (table, declared key) one key-grouped aggregate
    * reporting row count, distinct-key count, duplicated-key count,
    * and the worst multiplicity. Clean data yields n_dup_keys = 0 and
    * max_mult = 1, and the oracle PROVES those zeros rather than
    * assuming them; a dup-injection spec pins detection. Composite
    * keys (lineitem) pass as multiple columns — the group key widens,
    * the plan shape doesn't change.
    *
    * Scale: one hash exchange per table on its own key — the same
    * shuffle a dedup would pay, with a four-number result; tables
    * evaluate as one unioned plan, so the scheduler overlaps them. */
  def uniquenessAudit(
      tables: Seq[(String, DataFrame, Seq[String])]): DataFrame =
    tables.map { case (name, df, keyCols) =>
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("mult"))
        .agg(coalesce(sum(col("mult")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("mult") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_dup_keys"),
          coalesce(max(col("mult")), lit(0L)).as("max_mult"))
        .select(lit(name).as("table_key"), col("n_rows"), col("n_keys"),
          col("n_dup_keys"), col("max_mult"))
    }.reduce(_ unionByName _)

  /** Benford's-law first-digit audit — the classic forensic data-QC
    * check (Benford, "The law of anomalous numbers", Proc. APS 1938;
    * widely used for fraud/synthetic-data detection): naturally
    * occurring positive amounts have first significant digit d with
    * probability log10(1 + 1/d), so a fabricated or truncated column
    * shows up as a deviation profile. Emits one row per digit 1-9:
    * observed count, observed ppm, expected ppm, |deviation| ppm.
    *
    * Exactness: the value is converted to integer hundredths
    * (floor(x·100) — floor is IEEE-exact and engine-identical where
    * a raw double→int cast is NOT: Spark truncates, DuckDB rounds),
    * and the
    * first digit is the first character of that integer's decimal
    * rendering, which both engines produce identically; the expected
    * probabilities are FROZEN integer constants (floor(1e6·log10(1 +
    * 1/d))), so no runtime libm log appears on either side. Digits
    * with zero observations still report (the audit's absence signal).
    *
    * Scale: one scan + one 9-group aggregate; the total crosses as a
    * broadcast 1-row relation. 2^53 rule: counts are row counts,
    * obs·1e6 stays under 2^53 below ~9e9 rows per audit — shard the
    * audit by partition column above that. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = Seq(1L -> 301029L, 2L -> 176091L, 3L -> 124938L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66946L, 7L -> 57991L,
      8L -> 51152L, 9L -> 45757L).toDF("digit", "exp_ppm")
    // floor, never a raw integer cast: Spark truncates double→long
    // where DuckDB ROUNDS, so the portable form is floor() (IEEE-
    // exact and identical in both) followed by an integral cast
    val cents = df.filter(col(valueCol) > 0)
      .select(floor(col(valueCol) * lit(100)).cast("long").as("cents"))
      .filter(col("cents") > 0L)
    val obs = cents
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = broadcast(obs.agg(coalesce(sum(col("n")), lit(0L)).as("tot")))
    broadcast(expected).join(obs, Seq("digit"), "left")
      .crossJoin(tot)
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("tot") === 0L, lit(0L))
          .otherwise(expr("coalesce(n, 0) * 1000000 div tot")).as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** Class-balance audit per segment — the label-skew diagnostic a
    * training-data pipeline runs before any sampling decision: for
    * each segment, the class count, majority class + its share, and
    * the Gini impurity `1 − Σᵢ pᵢ²` — all in integer ppm. Impurity
    * (not entropy) deliberately: entropy needs a libm log per class
    * where Gini is pure rational arithmetic, and the two rank
    * segment skew identically for this audit's purpose. The exact
    * forms (the oracle's contract, floor divisions stated):
    * `majority_ppm = maj_n·10⁶ div n_rows`,
    * `gini_ppm = (n_rows² − Σᵢ nᵢ²)·10⁶ div n_rows²` — note this is
    * ONE floor at the end, not 10⁶ − floor(Σnᵢ²·10⁶/n²), which can
    * differ by 1. Majority ties break to the lexicographically
    * larger label via max(struct(n, label)) — deterministic under
    * any partitioning, replicated by the oracle.
    *
    * Scale: one (segment, label) count aggregate (map-side
    * combined), then a label-cardinality-sized second aggregate —
    * nothing wider than the label vocabulary ever shuffles. The
    * squared sums ride DECIMAL(38,0) so n_rows far past the 2⁵³
    * double envelope stays exact; only the ≤10⁶ ppm readouts ship
    * as longs. */
  def classBalance(df: DataFrame, segCol: String,
                   labelCol: String): DataFrame = {
    val counts = df.groupBy(col(segCol).as("segment"),
        col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        max(struct(col("n"), col("label"))).as("maj"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("sum_sq"))
      .withColumn("nsq",
        col("n_rows").cast("decimal(19,0)") * col("n_rows"))
      .select(col("segment"), col("n_rows"), col("n_classes"),
        col("maj.label").as("majority_label"),
        expr("maj.n * 1000000 div n_rows").as("majority_ppm"),
        // Spark's `div` is INTEGRAL division on decimals too — one
        // floor at the end, matching the oracle's `//` exactly
        expr("(nsq - sum_sq) * 1000000 div nsq").as("gini_ppm"))
  }

  /** Feature↔label ASSOCIATION audit — the chi-square contingency
    * table in integer-exact ppm, the leakage/imbalance detector a
    * training-data pipeline points at (source, label) or (shard,
    * label) before fitting anything: a feature value whose label
    * distribution diverges from the marginal is either leakage or a
    * sampling bug, and each cell's contribution says WHICH value.
    *
    * Per (feature, label) cell of the FULL marginal cross product —
    * zero-observed cells included, because a label that NEVER
    * appears under a feature value is exactly the leakage signal a
    * present-cells-only table would hide (and the classic χ² counts
    * them: O=0 contributes E): `n_obs`, the marginals `n_f`/`n_l`,
    * the expected count under independence in ppm
    * (`e_ppm = floor(10⁶·n_f·n_l / N)`), and the cell's chi-square
    * contribution in ppm —
    * `contrib_ppm = floor(10⁶·(n_obs·N − n_f·n_l)² / (N·n_f·n_l))`,
    * which is the classic (O−E)²/E with every division deferred to
    * ONE floor at the end (multiply (O−E)²/E through by N²/N²), so
    * the result is pure integer arithmetic both here and in the
    * DuckDB oracle. χ²·10⁶ for the table is the SUM of contrib_ppm
    * over cells — a sum of floors, deterministic and
    * engine-portable, never a float.
    *
    * Exactness envelope: the numerator is (n_obs·N − n_f·n_l)²·10⁶ ≤
    * N⁴·10⁶, computed in decimal(38,0) (Spark) / int128 (DuckDB).
    * decimal(38,0) caps at ~9.99·10³⁷, so the bound is N ≤ 3·10⁷
    * (N⁴·10⁶ = 8.1·10³⁵, comfortable margin) — NOT the 10⁸ a naive
    * digit count suggests, where the worst case already overflows
    * and ANSI-off Spark would return a silent NULL. The epilogue
    * GUARDS the envelope: n_tot ≥ 3·10⁷ raises, never NULLs — past
    * that, audit per segment (the usual deployment) or rescale the
    * ppm.
    *
    * Scale shape: one fact-table exchange builds the cells; the
    * marginals and total are VOCABULARY-sized re-aggregates of the
    * cells (never a second fact scan) broadcast back onto them. */
  def labelAssociation(df: DataFrame, featureCol: String,
                       labelCol: String): DataFrame =
    labelAssociationFromCells(
      df.groupBy(col(featureCol).as("feature"),
          col(labelCol).as("label"))
        .agg(count(lit(1)).as("n_obs")))

  /** The epilogue of [[labelAssociation]] over PRECOMPUTED cell
    * counts (feature, label, n_obs) — split out because the cells
    * are the audit's maintainable state: counts merge by ADDITION,
    * so a streaming feed folds each micro-batch's cells into the
    * store (the `aggDelta` law) and re-runs only this
    * vocabulary-sized epilogue, never the fact table. A spec pins
    * fold-then-epilogue == recompute, bit-exact. */
  def labelAssociationFromCells(cells: DataFrame): DataFrame = {
    val nf = cells.groupBy(col("feature")).agg(sum("n_obs").as("n_f"))
    val nl = cells.groupBy(col("label")).agg(sum("n_obs").as("n_l"))
    // envelope guard on the 1-row total: contrib_ppm's worst-case
    // numerator N⁴·10⁶ must fit decimal(38,0), i.e. N ≤ 3·10⁷ —
    // past that ANSI-off decimal arithmetic NULLs silently, which
    // an audit must never do. The when/otherwise keeps n_tot's type
    // (raise_error is NullType, coerced), costs one comparison on
    // one row, and turns an out-of-envelope run into a loud failure
    // with the remediation in the message.
    // isNull arm first: on EMPTY input sum() is NULL and a bare
    // `<=` would be NULL too, falling through to raise_error with a
    // nonsense "exceeds the envelope (null)" message — an empty
    // audit must stay an empty DataFrame (ADVICE r13)
    val tot = cells.agg(sum("n_obs").as("n_tot"))
      .select(when(col("n_tot").isNull ||
          col("n_tot") <= lit(30000000L), col("n_tot"))
        .otherwise(raise_error(concat(
          lit("labelAssociation: n_tot = "), col("n_tot"),
          lit(" exceeds the integer-exact envelope (N <= 3e7); " +
            "audit per segment or rescale the ppm"))))
        .as("n_tot"))
    // full marginal cross product (vocabulary² — broadcast-sized):
    // zero-observed cells surface with n_obs = 0
    nf.crossJoin(broadcast(nl))
      .join(broadcast(cells), Seq("feature", "label"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("diff", // n_obs·N − n_f·n_l: fits a long to N ~ 3e9
        col("n_obs") * col("n_tot") - col("n_f") * col("n_l"))
      .select(col("feature"), col("label"), col("n_obs"),
        col("n_f"), col("n_l"),
        expr("CAST(n_f AS DECIMAL(38,0)) * n_l * 1000000 div n_tot")
          .as("e_ppm"),
        expr("""CAST(diff AS DECIMAL(19,0)) * CAST(diff AS DECIMAL(19,0))
               | * 1000000
               | div (CAST(n_tot AS DECIMAL(38,0)) * n_f * n_l)"""
          .stripMargin.replace("\n", ""))
          .as("contrib_ppm"))
  }

  /** [[labelAssociation]]'s χ²·10⁶ total as a SINGLE AGGREGATE
    * COLUMN, so the audit can ride `Dataset.observe` on a live
    * stream (`graft.streaming.CorpusIngest.withLeakageMetrics`) —
    * drift becomes visible at ADMISSION time, per micro-batch, not
    * at the next batch audit. The aggregation state is the
    * contingency-cell map (vocabulary², never row-sized); `finish`
    * replays [[labelAssociationFromCells]]'s integer arithmetic —
    * full marginal cross product, zero-observed cells included, one
    * floor per cell, BigInt internally — so the observed number
    * equals `sum(contrib_ppm)` of the batch audit EXACTLY
    * (spec-pinned), under the same N ≤ 3·10⁷ envelope (loud, never
    * a silent wrap). Cell keys join feature and label with \\u0001;
    * a value containing that control byte is refused rather than
    * silently mis-bucketed. */
  private case class Chi2Row(feature: String, label: String)
  private object Chi2Aggregator
      extends org.apache.spark.sql.expressions.Aggregator[
        Chi2Row, Map[String, Long], Long] {
    private val Sep = '\u0001'
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], r: Chi2Row): Map[String, Long] = {
      // refuse nulls in the same loud style as the \\u0001 guard: a
      // bare NPE would kill the streaming query with no hint, and
      // silently dropping the row would break the spec-pinned
      // bit-equality with the batch audit (ADVICE r13) — the caller
      // must filter or sentinel-map nulls BEFORE the observe
      require(r.feature != null && r.label != null,
        "chi2Ppm: feature/label must be non-null — filter nulls or " +
          "map them to a sentinel before observing (the relational " +
          "labelAssociation path groups nulls as keys; this " +
          "aggregate refuses them rather than diverge silently)")
      require(r.feature.indexOf(Sep.toInt) < 0 &&
        r.label.indexOf(Sep.toInt) < 0,
        "chi2Ppm: feature/label must not contain \\u0001")
      val k = r.feature + Sep + r.label
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      }
    def finish(cells: Map[String, Long]): Long =
      if (cells.isEmpty) 0L
      else {
        val split = cells.toSeq.map { case (k, v) =>
          val i = k.indexOf(Sep.toInt)
          (k.substring(0, i), k.substring(i + 1), v)
        }
        val nf = split.groupMapReduce(_._1)(_._3)(_ + _)
        val nl = split.groupMapReduce(_._2)(_._3)(_ + _)
        val obs = split.map(t => ((t._1, t._2), t._3)).toMap
        val nL = split.map(_._3).sum
        require(nL <= 30000000L,
          s"chi2Ppm: n_tot = $nL exceeds the integer-exact envelope " +
            "(N <= 3e7); audit per segment or rescale the ppm")
        val n = BigInt(nL)
        var acc = BigInt(0)
        // the same FULL cross product as the relational epilogue —
        // zero-observed cells contribute through obs.getOrElse(0)
        for ((f, nfv) <- nf; (l, nlv) <- nl) {
          val o = BigInt(obs.getOrElse((f, l), 0L))
          val diff = o * n - BigInt(nfv) * BigInt(nlv)
          acc += diff * diff * 1000000 / (n * BigInt(nfv) * BigInt(nlv))
        }
        require(acc.isValidLong, s"chi2Ppm: total $acc overflows long")
        acc.toLong
      }
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** χ²·ppm of the (feature, label) association as an aggregate
    * Column — see [[Chi2Aggregator]]. */
  def chi2Ppm(feature: Column, label: Column): Column = {
    implicit val rowEnc: org.apache.spark.sql.Encoder[Chi2Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    udaf(Chi2Aggregator).apply(feature, label)
  }
}

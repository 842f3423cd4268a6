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
    val ruleAggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)).as(s"_v$i")
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
        round(lit(1.0) - col("violations").cast("double") /
          col("_total"), 6).as("pass_rate"))
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
}

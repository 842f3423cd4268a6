package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.HammingDistance

/** Session extensions: the injection point for graft's native
  * Catalyst surface (SURVEY §7.3 ladder: built-ins → custom
  * Expression → Rule/Strategy).
  *
  *  - `graft_hamming` registered as a real catalog function (usable
  *    from SQL and the Column API in any session built with these
  *    extensions — no per-session registration call needed).
  *  - [[FoldSelfHamming]]: a tiny optimizer rule demonstrating the
  *    `Rule[LogicalPlan]` seam — `graft_hamming(x, x)` is 0 for any
  *    non-null x, so it folds to a constant and the byte loop never
  *    runs. Mostly pedagogical; real candidates for this seam are
  *    similarity-predicate pushdowns (e.g. rewriting a cosine-radius
  *    filter to an LSH bucket pre-filter).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        graft.functions.DotProduct(children(0), children(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => graft.functions.MinHashSig(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => graft.functions.ShingleArray(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHashBits].getName, "graft_simhash"),
      (children: Seq[Expression]) => graft.functions.SimHashBits(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[graft.functions.WinnowSelect].getName, "graft_winnow"),
      (children: Seq[Expression]) => graft.functions.WinnowSelect(children(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(graft.sources.Layout.getClass.getName, "graft_zvalue"),
      (children: Seq[Expression]) => graft.sources.Layout.zValueExpr(children)))
    e.injectOptimizerRule(_ => FoldSelfHamming)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_asof"),
      new ExpressionInfo(AsOfJoin.getClass.getName, "graft_asof"),
      (children: Seq[Expression]) => AsOfJoin.tableFunction(children)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rangejoin"),
      new ExpressionInfo(
        graft.operators.RangeJoin.getClass.getName, "graft_rangejoin"),
      (children: Seq[Expression]) =>
        graft.operators.RangeJoin.tableFunction(children)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_overlapjoin"),
      new ExpressionInfo(
        graft.operators.RangeJoin.getClass.getName, "graft_overlapjoin"),
      (children: Seq[Expression]) =>
        graft.operators.RangeJoin.overlapTableFunction(children)))
  }
}

/** graft_hamming(x, x) ≡ 0 (null in, null out); fold the byte loop
  * away, keeping only the null check when the input is nullable. */
object FoldSelfHamming extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance(a, b) if a.semanticEquals(b) =>
        if (a.nullable) If(IsNull(a), Literal(null, IntegerType), Literal(0))
        else Literal(0)
    }
}

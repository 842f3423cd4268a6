package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two
  * fixed-alphabet strings (simhash bitstrings, hex fingerprints).
  *
  * A custom `Expression` with `doGenCode` instead of a Scala UDF so the
  * byte-level loop runs inside whole-stage codegen — no
  * serialization boundary, no boxing, vectorizes with the surrounding
  * operators (the preference order of SURVEY §7.3 / the build brief:
  * built-in > custom Expression > UDF).
  *
  * Semantics: positions where the byte sequences differ, plus the
  * length difference (so unequal-length inputs are "distant", not an
  * error). Null-safe: any null input → null.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string inputs, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[UTF8String]
    val sb = b.asInstanceOf[UTF8String]
    val na = sa.numBytes()
    val nb = sb.numBytes()
    val n = math.min(na, nb)
    var d = math.abs(na - nb)
    var i = 0
    while (i < n) {
      if (sa.getByte(i) != sb.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numBytes(), $b.numBytes());
         |int $d = Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft-native expressions into a session's function
  * registry, so they are usable from both the Column API
  * (`expr("graft_hamming(a,b)")`) and SQL. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): SparkSession = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming", exprs => HammingDistance(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash52", exprs => Hash52(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash64", exprs => Hash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSig(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => ShingleArray(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashBits(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", exprs => WinnowSelect(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue", exprs => graft.sources.Layout.zValueExpr(exprs),
      "built-in")
    // the SQL table-valued as-of (sessions built via extensions get it
    // from injectTableFunction; this covers externally-built sessions)
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_asof", exprs => graft.plans.AsOfJoin.tableFunction(exprs),
      "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_rangejoin",
      exprs => graft.operators.RangeJoin.tableFunction(exprs), "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_overlapjoin",
      exprs => graft.operators.RangeJoin.overlapTableFunction(exprs), "built-in")
    spark
  }
}

package graft

import org.apache.spark.sql.functions._

/** Session-extension surface: catalog-registered native function and
  * the self-hamming optimizer rule. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_hamming is callable from SQL and codegen-evaluates") {
    val got = spark.sql(
      "SELECT graft_hamming('1010', '1001') AS d, graft_hamming('abc', 'abcd') AS e")
      .collect()(0)
    assert(got.getInt(0) == 2 && got.getInt(1) == 1)
  }

  test("graft_hamming null-propagates") {
    val r = spark.sql("SELECT graft_hamming(CAST(NULL AS STRING), 'x') AS d")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("self-hamming folds to a constant (optimizer rule fires)") {
    val df = Seq("abcd", "efgh").toDF("s")
      .select(expr("graft_hamming(s, s)").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_hamming"),
      s"rule did not fold:\n$optimized")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0))
  }
}

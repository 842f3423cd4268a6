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

  test("native graft_dot is bit-identical to the declarative fold") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("embedding").as("a"))
    val pairs = emb.limit(50).crossJoin(
      Tables.embeddings(spark, sf("sf0.001"))
        .select(col("embedding").as("b")).limit(50))
    val diffs = pairs.select(
      (graft.functions.Portable.dot(col("a"), col("b")) -
        graft.functions.Portable.dotFold(col("a"), col("b"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs == 0L)
  }

  test("native rpLsh kernel buckets equal the declarative HOF form") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val native = graft.similarity.Knn.rpLshBuckets(emb)
    val hof = graft.similarity.Knn.rpLshBucketsHof(emb)
    assert(native.count() > 0)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "kernel and declarative buckets differ")
  }

  test("graft_zvalue from SQL agrees with the Column-API interleave") {
    val rows = spark.range(500).selectExpr(
      "pmod(hash(id), 256) AS x", "pmod(hash(id + 9), 256) AS y")
    rows.createOrReplaceTempView("zv_in")
    val viaSql = spark.sql(
      "SELECT graft_zvalue(x, y, 8) AS z FROM zv_in ORDER BY x, y, z")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = rows
      .select(col("x"), col("y"),
        graft.sources.Layout.zValue(col("x"), col("y"), 8).as("z"))
      .orderBy("x", "y", "z")
      .collect().map(_.getLong(2)).toSeq
    assert(viaSql == viaCol)
    // default bits arg and arity validation
    assert(spark.sql("SELECT graft_zvalue(3, 1) AS z").head().getLong(0) ==
      spark.sql("SELECT graft_zvalue(3, 1, 16) AS z").head().getLong(0))
    intercept[Exception](spark.sql("SELECT graft_zvalue(1)"))
  }

  test("tune() is idempotent on the runtime strategy seam") {
    val before = spark.experimental.extraStrategies.size
    GraftSession.tune(spark)
    GraftSession.tune(spark)
    val asofs = spark.experimental.extraStrategies
      .count(_ eq graft.plans.AsOfJoinStrategy)
    assert(asofs <= 1, "AsOfJoinStrategy registered more than once")
    assert(spark.experimental.extraStrategies.size <= before + 1)
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

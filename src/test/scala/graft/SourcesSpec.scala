package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-format round-trips and the SQL catalog surface. */
class SourcesSpec extends SparkSpec {

  test("events round-trip through JSON and CSV with values intact") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value", "sec")
    ev.write.mode("overwrite").json(s"$dir/json")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    val fromJson = spark.read.json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")
    assert(fromJson.count() == ev.count() && fromCsv.count() == ev.count())

    def sums(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum(col("event_id").cast("long")),
      round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2))
      .collect()(0)
    assert(sums(fromJson) == sums(ev))
    assert(sums(fromCsv) == sums(ev))
  }

  test("registerAll exposes the full SQL surface over a scale factor") {
    Tables.registerAll(spark, sf("sf0.001"))
    val row = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT n_name) AS nations
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) == 150L && row.getLong(1) > 0)
    val ev = spark.sql("SELECT max(sec) - min(sec) AS span FROM events")
      .collect()(0)
    assert(ev.getLong(0) > 0)
  }
}

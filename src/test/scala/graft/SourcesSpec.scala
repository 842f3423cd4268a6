package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-format round-trips and the SQL catalog surface. */
class SourcesSpec extends SparkSpec {

  test("schema evolution: mergeSchema unions drifted parquet batches") {
    import spark.implicits._
    // batch 1 (old writer) lacks the column batch 2 (new writer) adds
    val dir = Files.createTempDirectory("graft_drift").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "a", null), (2L, "b", 9.5)),
      "old rows must read the new column as NULL")
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpo").toString + "/t"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      // an incremental job rewrites ONLY day=d2
      Seq((99L, "d2")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "d1"), (99L, "d2")),
        s"static overwrite semantics leaked: $got")
    } finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("events loader tolerates every observed ts physical encoding") {
    // The driver has regenerated events.parquet with different ts
    // physical types across rounds (TIMESTAMP(NANOS) read as long
    // under nanosAsLong=true; plain timestamp[us] read as NTZ). Round
    // 4 lost 49 queries to a silent regen — this guard names the
    // failure mode: Tables.events must normalize each encoding to the
    // same ts_us/sec/ts grains.
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tsdrift").toString
    val micros = Seq(1700000000000000L, 1700000001500000L, 1700000123456789L)
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    // encoding 1: raw long nanos (what TIMESTAMP(NANOS) surfaces as
    // under spark.sql.legacy.parquet.nanosAsLong=true)
    rows.map { case (id, us) => (id, us * 1000L) }
      .toDF("event_id", "ts").write.parquet(s"$base/nanos/events.parquet")
    // encoding 2: timestamp[us] without tz → TIMESTAMP_NTZ (the
    // round-4 regen; session tz is UTC so the instant is exact)
    rows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us"))
        .cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$base/ntz/events.parquet")
    // encoding 3: timestamp[us] adjusted to UTC → TimestampType
    rows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$base/tz/events.parquet")

    for (enc <- Seq("nanos", "ntz", "tz")) {
      val got = Tables.events(spark, s"$base/$enc")
        .select("event_id", "ts_us", "sec")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = rows.map { case (id, us) => (id, us, us / 1000000L) }
      assert(got == want, s"encoding '$enc' mis-normalized: $got")
      val tsType = Tables.events(spark, s"$base/$enc").schema("ts").dataType
      assert(tsType == org.apache.spark.sql.types.TimestampType,
        s"encoding '$enc' must expose a µs TimestampType ts, got $tsType")
    }
  }

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

  test("events round-trip through ORC with values intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value", "sec")
    ev.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() == ev.count())
    val s1 = back.agg(sum(col("event_id")),
      round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)).collect()(0)
    val s2 = ev.agg(sum(col("event_id")),
      round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)).collect()(0)
    assert(s1 == s2)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // 95% of left rows share one key → one partition dwarfs the rest
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val right = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      joined.write.format("noop").mode("overwrite").save()
      assert(joined.count() > 0)
      // the skew handling is best-effort; what we pin is that the skewed
      // join completes and AQE was in the plan path
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's parquet tables (TESTDATA.md).
  *
  * All engine code reads tables through here so schema quirks are handled
  * in exactly one place. The one real quirk: `events.parquet`'s `ts`
  * physical type varies by test-data generation (TIMESTAMP(NANOS) or
  * timestamp[us]); [[events]] normalizes either to `ts_ns`/`ts_us`/`sec`
  * plus a µs `ts`, mirroring the reference's two time grains (millis
  * events / second aggregates — see SURVEY.md §1.1, reference
  * functions.js:49-58).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table (plus the canonical `events` view) as a
    * temp view so the full SQL surface works over a scale-factor
    * directory: `spark.sql("SELECT ... FROM lineitem JOIN ...")`. */
  def registerAll(s: SparkSession, d: String): Unit = {
    names.filter(_ != "events")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }

  /** Events with the canonical time grains materialized:
    *  - `ts_us`  — epoch micros (long), the event-time grain. Micros,
    *               not the file's nanos: other engines (and float64
    *               round-trips) cap at µs resolution, so µs is the
    *               portable grain; ordering ties broken by event_id.
    *  - `sec`    — epoch seconds (long), the aggregate grain
    *               (integer division: exact, no double rounding)
    *  - `ts`     — TimestampType (µs) for window/streaming ops
    *
    * The physical `ts` encoding has drifted across test-data
    * generations (TIMESTAMP(NANOS) read as long under
    * `nanosAsLong=true`; plain `timestamp[us]` read as
    * TIMESTAMP_NTZ), so we branch on the observed Spark type rather
    * than assuming one. The session runs in UTC, so casting NTZ to
    * an instant is exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) surfaced as raw nanos via nanosAsLong=true
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events.parquet has TIMESTAMP(NANOS); session must set " +
            "spark.sql.legacy.parquet.nanosAsLong=true (use GraftSession)")
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", expr("ts_us * 1000L"))
          .drop("ts")
      case other =>
        throw new IllegalArgumentException(
          s"events.parquet ts has unsupported type $other; expected " +
            "long (nanosAsLong), timestamp, or timestamp_ntz")
    }
    tsUs
      .withColumn("sec", expr("ts_us div 1000000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}

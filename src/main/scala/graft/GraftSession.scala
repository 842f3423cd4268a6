package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured session.
  *
  * Scale posture (the same settings that matter on a real cluster):
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join
  *    splitting, and dynamic broadcast-join demotion/promotion.
  *  - shuffle.partitions sized to the parallelism actually available
  *    (32 locally; on a 1000-executor cluster this would be a multiple
  *    of total cores — AQE coalesces the excess either way).
  *  - UTC session timezone so results hash-match the DuckDB oracle.
  *  - nanosAsLong for the driver's TIMESTAMP(NANOS) events table.
  */
object GraftSession {

  def builder(master: String = s"local[${defaultCpus}]",
              shufflePartitions: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // the generated-class cache defaults to 100 entries (static conf);
      // a 120-query suite run in a cycle is a worst-case LRU access
      // pattern over >100 plans — 100% eviction, so every pass pays
      // Janino recompilation (~1s) even after a warm-up pass. Size it
      // to hold the whole suite's codegen units.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.max(4, Runtime.getRuntime.availableProcessors()))

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Apply graft-required runtime confs to an externally-built session
    * (e.g. the driver's own). Only sets what is safe to set at runtime.
    * NOTE: `spark.sql.codegen.cache.maxEntries` is a STATIC conf and
    * cannot be applied here — a session that will run the full query
    * suite repeatedly should be built via [[builder]] (or set that
    * conf itself at build time), or it pays generated-class
    * recompilation once the suite exceeds the default 100 cache
    * entries. */
  def tune(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // right-size shuffles for the actual parallelism; AQE coalesces
    // further at runtime (a bare session defaults to 200)
    s.conf.set("spark.sql.shuffle.partitions", defaultCpus.toString)
    graft.functions.GraftFunctions.register(s)
    // planner strategies normally arrive via extensions at build time;
    // experimental.extraStrategies is the public runtime seam for a
    // session graft didn't build (idempotent)
    if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    s
  }
}

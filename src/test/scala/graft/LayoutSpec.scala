package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Physical layout machinery: bucketed shuffle-free joins, partition
  * pruning, salted-join equivalence. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def dropManaged(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("same-key bucketed tables join without any exchange") {
    dropManaged("graft_b_orders")
    dropManaged("graft_b_cust")
    val orders = Tables.orders(spark, sf("sf0.001"))
    val customer = Tables.customer(spark, sf("sf0.001"))
    Layout.writeBucketed(orders.select("o_custkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "k"), "graft_b_orders", "k", 8)
    Layout.writeBucketed(customer.select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "k"), "graft_b_cust", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "graft_b_orders", "graft_b_cust", "k")
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join over same-key bucketed tables needs no exchange") {
    dropManaged("graft_b_trades")
    dropManaged("graft_b_quotes")
    val trades = (1 to 500).map(i => (i.toLong % 16, i.toLong * 10, i.toLong))
      .toDF("k", "t", "tid")
    val quotes = (1 to 300).map(i => (i.toLong % 16, i.toLong * 13, i * 1.5))
      .toDF("k", "qt", "px")
    Layout.writeBucketed(trades, "graft_b_trades", "k", 8)
    Layout.writeBucketed(quotes, "graft_b_quotes", "k", 8)
    val joined = graft.plans.AsOfJoin.asof(
      spark.table("graft_b_trades"), spark.table("graft_b_quotes"),
      Seq("k"), "t", "qt")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed scans should satisfy the as-of distribution:\n$plan")
  }

  test("partitioned write prunes directories for partition predicates") {
    val dir = Files.createTempDirectory("graft_part").toString + "/ev"
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("etype", col("event_type"))
    Layout.writePartitioned(ev.select("event_id", "user_id", "value", "etype"),
      dir, Seq("etype"))
    val read = spark.read.parquet(dir).filter(col("etype") === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(etype"),
      s"partition filter not pushed:\n$plan")
    assert(read.count() ==
      ev.filter(col("event_type") === "click").count())
  }

  test("zValue matches a reference bit-interleave and orders locality") {
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val rows = spark.range(1000).select(
      pmod(hash(col("id")), lit(256)).cast("long").as("x"),
      pmod(hash(col("id") + 7), lit(256)).cast("long").as("y"))
    val got = rows.withColumn("z", Layout.zValue(col("x"), col("y"), 8))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // masking: values beyond `bits` wrap like their masked low bits
    val wide = Seq((300L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8)).head().getLong(0)
    assert(wide == ref(300 & 255, 5, 8))
  }

  test("n-dim zValueN generalizes the 2-d interleave") {
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.size
      var z = 0L
      for (d <- vals.indices; i <- 0 until bits)
        z |= ((vals(d) >> i) & 1L) << (i * n + d)
      z
    }
    val rows = spark.range(300).select(
      pmod(hash(col("id")), lit(64)).cast("long").as("a"),
      pmod(hash(col("id") + 1), lit(64)).cast("long").as("b"),
      pmod(hash(col("id") + 2), lit(64)).cast("long").as("c"))
    rows.withColumn("z",
        Layout.zValueN(Seq(col("a"), col("b"), col("c")), 6))
      .collect().foreach { r =>
        assert(r.getLong(3) ==
          ref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 6))
      }
    // n=2 must agree with the specialized zValue
    val two = rows.select(
      Layout.zValue(col("a"), col("b"), 6).as("z2"),
      Layout.zValueN(Seq(col("a"), col("b")), 6).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(two == 0, "zValueN(n=2) diverges from zValue")
  }

  test("z-ordered write yields files with disjoint z ranges on both dims") {
    val dir = Files.createTempDirectory("graft_z").toString + "/pts"
    val pts = spark.range(4096).select(
      pmod(hash(col("id")), lit(128)).cast("long").as("x"),
      pmod(hash(col("id") * 31), lit(128)).cast("long").as("y"))
    Layout.writeZOrdered(pts, dir, "x", "y", numFiles = 8, bits = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length > 1, "expected multiple output files")
    // per-file z ranges must not overlap (range partitioning by z)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(min(Layout.zValue(col("x"), col("y"), 8)),
          max(Layout.zValue(col("x"), col("y"), 8))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file z-ranges: $hi vs $lo2")
      case _ =>
    }
    // and z-clustering narrows per-file spans on the SOURCE dims too:
    // each file should cover well under the full 0..127 x-range
    val spans = files.map { f =>
      val r = spark.read.parquet(f).select(min(col("x")), max(col("x"))).head()
      r.getLong(1) - r.getLong(0)
    }
    assert(spans.min < 127, s"no file narrowed the x span: ${spans.toSeq}")
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = Files.createTempDirectory("graft_dpp").toString + "/fact"
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("etype", col("event_type"))
    Layout.writePartitioned(
      ev.select("event_id", "user_id", "value", "etype"), dir, Seq("etype"))
    val fact = spark.read.parquet(dir)
    // selective dim: only one event type survives the dim filter, so
    // the fact side should scan only that partition AT RUNTIME. The
    // dim must be a real source (a local Seq folds its Filter into
    // the LocalRelation before the pruning rule can see selectivity)
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    Seq(("click", 1), ("scroll", 2), ("error", 3)).toDF("t", "w")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("w") === 1)
    // the cost heuristic never sees benefit at toy sizes — disable
    // stats-based benefit estimation so the mechanism itself is
    // exercised (at real scale the stats path enables it organically)
    val prev = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = fact.join(dim, fact("etype") === dim("t"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"dynamic partition pruning missing:\n$plan")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
  }

  test("compaction reduces file count, preserves data, restores skipping") {
    val base = Files.createTempDirectory("graft_compact").toString
    val src = base + "/src"
    val dst = base + "/dst"
    // simulate a streaming writer's droppings: 64 tiny files
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "value")
    ev.repartition(64).write.parquet(src)
    val (nIn, nOut) = Layout.compact(spark, src, dst,
      targetFileBytes = 1L << 20, sortCol = Some("event_id"))
    assert(nIn == 64 && nOut < 8, s"$nIn -> $nOut files")
    val before = ev.orderBy("event_id").collect()
    val after = spark.read.parquet(dst).orderBy("event_id").collect()
    assert(before.toSeq == after.toSeq, "compaction changed the data")
    // sorted compaction: per-file event_id ranges must be disjoint
    val files = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    if (files.length > 1) {
      val ranges = files.map { f =>
        val r = spark.read.parquet(f)
          .select(min(col("event_id")), max(col("event_id"))).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"overlapping event_id ranges after compaction")
        case _ =>
      }
    }
  }

  test("salted join returns exactly the plain join result") {
    val orders = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val customer = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(customer, "k")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2).as("s"))
      .orderBy("c_mktsegment").collect()
    val salted = Layout.saltedJoin(orders, customer, "k", 4)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2).as("s"))
      .orderBy("c_mktsegment").collect()
    assert(plain.toSeq == salted.toSeq)
  }
}

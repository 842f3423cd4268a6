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

package graft

import org.apache.spark.sql.functions._

import graft.dedup.Blocking

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  test("sorted neighborhood pairs each record with its next w in-block") {
    // block 1: ids 10,20,30,40 in sort order; block 2: ids 50,60
    val df = Seq(
      (1, 10L, 1.0), (1, 20L, 2.0), (1, 30L, 3.0), (1, 40L, 4.0),
      (2, 50L, 1.0), (2, 60L, 2.0))
      .toDF("b", "id", "s")
    val pairs = Blocking.sortedNeighborhood(df, $"b", $"s", $"id", w = 2)
      .select($"id1", $"id2", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(pairs == Set(
      (10L, 20L, 1), (10L, 30L, 2),
      (20L, 30L, 1), (20L, 40L, 2),
      (30L, 40L, 1),
      (50L, 60L, 1)))
  }

  test("blocks never cross-pair and ties break on id deterministically") {
    val df = Seq((1, 10L, 5.0), (1, 20L, 5.0), (2, 30L, 5.0))
      .toDF("b", "id", "s")
    val pairs = Blocking.sortedNeighborhood(df, $"b", $"s", $"id", w = 1)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L))) // tie -> id order; 30 is alone
  }

  test("candidate pairs are partitioning-invariant") {
    val cust = Tables.customer(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Blocking.customerNeighbors(cust)
        .orderBy("c_nationkey", "id1", "dist")) ==
      rows(Blocking.customerNeighbors(cust.repartition(7))
        .orderBy("c_nationkey", "id1", "dist")))
  }

  test("customer neighborhood is linear in rows and join-free") {
    val cust = Tables.customer(spark, sf("sf0.001"))
    val out = Blocking.customerNeighbors(cust, w = 2)
    val n = cust.count()
    val cnt = out.count()
    assert(cnt <= 2 * n)
    // payload rides the window: no join operator anywhere in the plan
    val hasJoin = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.toLowerCase.contains("join") => p
    }.nonEmpty
    assert(!hasJoin, out.queryExecution.executedPlan.toString)
    // name_dist is a real edit distance: symmetric-free sanity check
    assert(out.filter($"name_dist" < 0).count() == 0)
  }

  test("entities collapse transitive matches; singletons never emitted") {
    val cust = Tables.customer(spark, sf("sf0.001"))
    val ents = Blocking.customerEntities(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ents.nonEmpty)
    // every entity merges at least two records, and the id is the
    // smallest member (so max_member strictly exceeds it)
    assert(ents.forall(_._2 >= 2))
    assert(ents.forall(e => e._3 > e._1))
    // entity ids are distinct roots
    assert(ents.map(_._1).distinct.length == ents.length)
    // members partition: total membership equals the label count the
    // closure produced, and no record lands in two entities
    val matches = Blocking.customerNeighbors(cust)
      .filter($"name_dist" <= 3 && $"bal_gap" <= 50.0)
    val nodes = matches.select($"id1").union(matches.select($"id2"))
      .distinct().count()
    assert(ents.map(_._2).sum == nodes)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-pruned semi-join: exact equivalence with the plain semi-join,
  * no false negatives (JVM build == Catalyst probe), sane FP rate,
  * plan shape (filter precedes the join). */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 1 << 14
  private val Hashes = 5

  test("pruned semi-join equals the plain semi-join exactly") {
    val fact = spark.range(20000).select(
      pmod(hash(col("id")), lit(5000)).cast("long").as("k"),
      col("id").as("fid"))
    val dim = spark.range(800).select(
      (pmod(hash(col("id") + 3), lit(4000)) + lit(500)).cast("long").as("dk"))
    val plain = fact.join(dim, fact("k") === dim("dk"), "left_semi")
      .select($"fid").collect().map(_.getLong(0)).toSet
    val pruned = BloomJoin.prunedSemiJoin(fact, dim, "k", "dk", Bits, Hashes)
      .select($"fid").collect().map(_.getLong(0)).toSet
    assert(pruned === plain)
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 3000).map(i => s"key-$i")
    val bits = BloomJoin.build(keys.toDF("k"), "k", Bits, Hashes)
    val missed = keys.toDF("k")
      .filter(!BloomJoin.mightContain(bits, col("k"), Bits, Hashes))
      .count()
    assert(missed == 0, s"$missed false negatives — JVM/Catalyst hash mismatch")
  }

  test("null fact keys are dropped exactly like the plain semi-join drops them") {
    val fact = Seq(Some(1L), Some(2L), None, Some(3L))
      .toDF("k").withColumn("fid", monotonically_increasing_id())
    val dim = Seq(1L, 3L).toDF("dk")
    val plain = fact.join(dim, fact("k") === dim("dk"), "left_semi")
      .select($"k").collect().map(_.getLong(0)).toSet
    val pruned = BloomJoin.prunedSemiJoin(fact, dim, "k", "dk", Bits, Hashes)
      .select($"k").collect().map(_.getLong(0)).toSet
    assert(pruned === plain && plain === Set(1L, 3L))
  }

  test("false-positive rate stays near theory for absent keys") {
    val inserted = (0 until 1000).map(i => s"in-$i")
    val bits = BloomJoin.build(inserted.toDF("k"), "k", Bits, Hashes)
    val absent = (0 until 10000).map(i => s"out-$i")
    val fp = absent.toDF("k")
      .filter(BloomJoin.mightContain(bits, col("k"), Bits, Hashes))
      .count()
    // theory: (1 - e^(-kn/m))^k with k=5, n=1000, m=16384 ≈ 0.2% —
    // accept up to 10x
    assert(fp < 200, s"false-positive rate ${fp / 10000.0} implausibly high")
  }

  test("plan: the bloom filter runs before the exchange feeding the join") {
    val fact = spark.range(5000).select(col("id").as("k"))
    val dim = spark.range(100).select((col("id") * 7).as("dk"))
    val df = BloomJoin.prunedSemiJoin(fact, dim, "k", "dk", Bits, Hashes)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("LeftSemi"), s"missing semi join:\n$p")
    // the digest probe must appear in a Filter, not inside the join itself
    assert("Filter .*(graft_hash64|md5)".r.findFirstIn(p).isDefined,
      s"bloom probe filter missing from the plan:\n$p")
  }
}

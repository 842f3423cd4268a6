package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Properties of the portable building blocks (SURVEY §5.2). */
class PortableSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: count = max(0, n_tokens - 2); each shingle has 3 tokens") {
    val texts = (0 to 12).map(n => (1 to n).map(i => s"w$i").mkString(" "))
      .filter(_.nonEmpty)
    val df = texts.toDF("text")
      .select(col("text"), Portable.shingles(col("text")).as("sh"))
    df.collect().foreach { r =>
      val n = r.getString(0).split(" ").length
      val sh = r.getSeq[String](1)
      assert(sh.length == math.max(0, n - 2))
      sh.foreach(s => assert(s.split(" ").length == 3))
    }
  }

  test("hash52 native kernel equals the declarative md5-hex reference on varied inputs") {
    val rnd = new scala.util.Random(99)
    val inputs = (1 to 500).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", " ", "0", "-1", "3:abc", "é中文", "a|b|c")
    val rows = inputs.distinct.toDF("s")
      .select(Portable.hash52(col("s")).as("native"),
        Portable.hash52Ref(col("s")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and on a non-string input (the cast path)
    val num = Seq(42L, -7L, 0L).toDF("n")
      .select(Portable.hash52(col("n")).as("native"),
        Portable.hash52Ref(col("n")).as("ref")).collect()
    num.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("cosine: self-similarity is 1, symmetric, in [-1, 1]") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(-1.0f, 0.5f, 2.0f, -3.0f)),
      (2L, Array(0.1f, 0.1f, 0.1f, 0.1f))).toDF("id", "v")
    val self = vecs.select(Portable.cosine(col("v"), col("v")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 1.0))
    val a = vecs.filter($"id" === 0).select(col("v").as("a"))
    val b = vecs.filter($"id" === 1).select(col("v").as("b"))
    val ab = a.crossJoin(b)
    val c1 = ab.select(Portable.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    val c2 = ab.select(Portable.cosine(col("b"), col("a"))).collect()(0).getDouble(0)
    assert(c1 == c2 && c1 >= -1.0 && c1 <= 1.0)
  }

  test("exactSum is order- and partitioning-independent (decimal accumulation)") {
    val xs = (1 to 1000).map(i => i * 0.01 + 0.001)
    val fwd = xs.toDF("x").agg(Portable.exactSum(col("x"), 4)).collect()(0).getDouble(0)
    val rev = xs.reverse.toDF("x").repartition(7)
      .agg(Portable.exactSum(col("x"), 4)).collect()(0).getDouble(0)
    assert(fwd == rev)
  }

  test("native shingle kernel equals the declarative HOF formulation") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val diffs = docs.select(
      Portable.shingles(col("text")).as("a"),
      Portable.shinglesHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diffs == 0L)
  }

  test("native simhash kernel equals the declarative aggregation") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sf("sf0.001"))
    // declarative formulation, inline (the shape the oracle mirrors)
    val hexDigit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bitCols = (1 to 16).map { i =>
      sum(when(substring(md5(col("tok")), i, 1).isin(hexDigit: _*), 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = docs.select(col("doc_id"), explode(Portable.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val bits = (1 to 16).map(i => when(col(s"b$i") > 0, "1").otherwise("0"))
    val declarative = agg.select(col("doc_id"), concat(bits: _*).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val native = Dedup.simhash(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(native.toSeq == declarative.toSeq)
  }

  test("hex16 is deterministic and 16 lowercase hex chars") {
    val h = Seq("a", "b", "a").toDF("s")
      .select(Portable.hex16(col("s")).as("h")).collect().map(_.getString(0))
    assert(h(0) == h(2) && h(0) != h(1))
    assert(h.forall(_.matches("[0-9a-f]{16}")))
  }

  test("per-window top-k totals match sort-take (property over events table)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val topViaLimit = graft.operators.Movements.topkRecent(ev, 1L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = graft.operators.Movements.perSecondCounts(
      ev.filter(col("user_id") === 1L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      .sortBy(-_._1).take(10)
    assert(topViaLimit == all)
  }

  test("incremental merge equals full recompute (view-maintenance property)") {
    import graft.operators.Movements
    val ev = Tables.events(spark, sf("sf0.001"))
    val old = ev.filter(col("event_id") % 2 === 0)
    val fresh = ev.filter(col("event_id") % 2 === 1)
    val merged = Movements.mergeIncrement(Movements.perSecond(old), fresh)
      .orderBy("user_id", "sec").collect().map(_.toString)
    val full = Movements.perSecond(ev)
      .orderBy("user_id", "sec").collect().map(_.toString)
    assert(merged.toSeq == full.toSeq)
  }

  test("sum of per-second counts equals total events (conservation)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val total = ev.count()
    val summed = graft.operators.Movements.perSecondCounts(ev)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == summed)
  }

  test("variant access: typed get, missing path null, type-mismatch null") {
    val df = Seq(
      (1L, """{"k": 42}"""),
      (2L, """{"k": "text"}"""),   // string k: long-get must null out
      (3L, """{"other": 1}"""))    // no k at all
      .toDF("event_id", "props")
    val got = graft.functions.FunctionCoverage.variantFuncs(df)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(5)))
    assert(got(0) == ((1L, Some(42L), Some("42"), true)))
    // try_variant_get returns null on a failed cast, never throws
    assert(got(1) == ((2L, None, Some("text"), true)))
    assert(got(2) == ((3L, None, None, false)))
  }

  test("bitmap distinct equals exact distinct across bucket boundaries") {
    // keys straddle the 32768-bit bucket boundary and repeat
    val df = ((1L to 40000L) ++ (1L to 40000L) ++ Seq(100000L))
      .map(k => ("A", k)).toDF("l_returnflag", "l_partkey")
    val got = graft.functions.FunctionCoverage.bitmapDistinct(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 40001L))
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout at rest — the part of 100 TB performance that
  * happens before any query runs.
  *
  *  - **Partitioned writes** (`writePartitioned`): directory-level
  *    pruning for predicates on the partition column; a date/user
  *    filter then reads only matching directories.
  *  - **Bucketed tables** (`writeBucketed`): co-located join/agg keys.
  *    Two tables bucketed on the same key with the same bucket count
  *    join with ZERO exchanges — at cluster scale this turns the
  *    nightly fact⋈fact join from a full shuffle into a local merge.
  *  - **Salting** (`saltedJoin`): spreads a skewed hot key across
  *    `saltFactor` sub-keys by replicating the (small) right side —
  *    the manual fallback for skew the AQE skew-split can't reach
  *    (e.g. broadcast-ineligible dimension with one hot key).
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted table registered in the session catalog
    * (bucket metadata lives in the catalog, so this writes a managed
    * table rather than a bare path). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-key bucketed tables — shuffle-free when bucket
    * specs line up (verify with `assertNoExchange` in tests). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-resistant equi-join: left side gets a salt derived from its
    * physical position (monotonically_increasing_id), right side is
    * replicated `saltFactor` times. The salt is LAYOUT-DEPENDENT —
    * it changes across retries and repartitioning — but semantics are
    * preserved regardless of which salt a row lands on (the right
    * side covers every salt), and position-based salting is the only
    * scheme that still spreads a hot key whose rows are
    * byte-identical (a content hash would collapse them back onto
    * one reducer). Semantics identical to `left.join(right, key)`
    * for a right side unique on `key`. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(explodedRight, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Hot-key-only salting — the form that survives 100 TB. Full-side
    * salting ([[saltedJoin]]) replicates the ENTIRE other side
    * `saltFactor`×, so its cost grows with the table even when only a
    * handful of keys are skewed. Here the left's key histogram (one
    * map-side-combinable count whose output is |distinct keys|, then
    * a `minHotCount` filter that should leave only the few genuinely
    * hot keys) splits both sides into a hot slice — salted — and a
    * cold slice — plain equi-join; the union of the two disjoint
    * joins is row-identical to `left.join(right, key)` REGARDLESS of
    * where the threshold lands, so the split is a pure performance
    * knob, never a semantics one. The hot-key set broadcasts (it must
    * be small — if it isn't, the data isn't skewed, it's big, and
    * salting is the wrong tool).
    *
    * SKEW-SIDE ASSUMPTION (default `bothSides = false`): hot keys are
    * detected from the LEFT side's histogram only — the right side is
    * expected unique (or near-unique) on `key`, as at the
    * lineitem⋈orders call sites, where left-side fan-out is the only
    * possible skew. A key skewed only on the RIGHT side takes the
    * cold path and still concentrates on one task. With
    * `bothSides = true`, BOTH histograms are taken: left-hot keys
    * take the left-salted path, right-ONLY-hot keys take the
    * mirrored right-salted path (salt the right by position, explode
    * the left — salting the populous side is what spreads the work),
    * and the rest go cold; the three key sets are disjoint, so the
    * union stays row-identical to the plain join. A key hot on BOTH
    * sides makes the join's OUTPUT quadratic in that key — no salting
    * scheme fixes output size; it lands on the left-salted path. */
  def saltedJoinHot(left: DataFrame, right: DataFrame, key: String,
                    saltFactor: Int, minHotCount: Long,
                    bothSides: Boolean = false): DataFrame = {
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minHotCount)
      .select(col(key))
    val hotB = broadcast(hot)
    val hotJoin = saltedJoin(
      left.join(hotB, Seq(key), "left_semi"),
      right.join(hotB, Seq(key), "left_semi"),
      key, saltFactor)
    if (!bothSides) {
      val coldJoin = left.join(hotB, Seq(key), "left_anti")
        .join(right.join(hotB, Seq(key), "left_anti"), Seq(key))
      hotJoin.unionByName(coldJoin)
    } else {
      val hotR = broadcast(
        right.groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
          .filter(col("_cnt") >= minHotCount)
          .select(col(key))
          .join(hotB, Seq(key), "left_anti"))
      // mirrored path for right-only-hot keys; unionByName restores
      // the left-then-right column order the caller expects
      val hotRightJoin = saltedJoin(
        right.join(hotR, Seq(key), "left_semi"),
        left.join(hotR, Seq(key), "left_semi"),
        key, saltFactor)
      val coldJoin = left
        .join(hotB, Seq(key), "left_anti")
        .join(hotR, Seq(key), "left_anti")
        .join(right.join(hotB, Seq(key), "left_anti")
          .join(hotR, Seq(key), "left_anti"), Seq(key))
      hotJoin.unionByName(hotRightJoin).unionByName(coldJoin)
    }
  }

  /** Morton (z-order) value: interleave the low `bits` bits of two
    * non-negative dimensions — x on even positions, y on odd. Rows
    * close in BOTH dimensions get close z-values, so range-sorting by
    * z clusters 2-D locality into the same files and parquet row
    * groups; min/max statistics then skip files for predicates on
    * EITHER dimension (the multi-dimensional clustering trick of
    * Z-ordered storage, cf. Morton 1966). Inputs are masked to
    * `bits` bits (values beyond wrap deterministically — mask, don't
    * clamp, so the mapping stays a pure bit function both engines
    * compute identically). Built-ins only: constant-distance shifts
    * and bitwise or/and, all inside whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Small-file compaction — the maintenance half of layout at scale:
    * streaming/incremental writers leave thousands of KB-sized files
    * whose per-file open/footer costs dominate scans. Rewrites
    * `srcPath` into ceil(totalBytes / targetFileBytes) files at
    * `dstPath` (write-then-swap is left to the caller's table
    * protocol). With `sortCol`, range-partitions + sorts so the
    * compacted files also get disjoint min/max on that column
    * (restores file-skipping); otherwise a plain even repartition.
    * File sizes come from the Hadoop FS API, so this works on any
    * cluster filesystem, not just local disk.
    *
    * Returns (input file count, output file count). */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              targetFileBytes: Long = 128L << 20,
              sortCol: Option[String] = None): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val src = spark.read.parquet(srcPath)
    val files = src.inputFiles
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val out = sortCol match {
      case Some(c) => src.repartitionByRange(n, col(c)).sortWithinPartitions(c)
      case None    => src.repartition(n)
    }
    out.write.mode(SaveMode.Overwrite).parquet(dstPath)
    (files.length, n)
  }

  /** N-dimensional Morton value: round-robin interleave of the low
    * `bits` bits of each dimension (dimension d owns positions
    * i·n + d). [[zValue]] is the n=2 special case; n·bits must stay
    * ≤ 63. Use for clustering on 3+ correlated access dimensions
    * (e.g. time bucket × user shard × event type code). */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, "need at least 2 dimensions")
    require(bits >= 1 && dims.size * bits <= 63,
      s"need 1 <= bits and ${dims.size}*bits <= 63")
    val n = dims.size
    val mask = (1L << bits) - 1
    val terms = for {
      (c, d) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(lit(mask)), i)
        .bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Catalyst builder for the SQL form `graft_zvalue(x, y[, bits])` —
    * the same interleave as [[zValue]], built as a raw expression
    * tree for the function-registry seam (children-only builder).
    * `bits` must be an integer literal; the spec asserts SQL and
    * Column forms agree bit-for-bit. */
  def zValueExpr(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    require(children.size == 2 || children.size == 3,
      "graft_zvalue(x, y[, bits])")
    val bits = children.lift(2) match {
      case None => 16
      case Some(Literal(v: Int, IntegerType)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"graft_zvalue: bits must be an integer literal, got $other")
    }
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    val mask = Literal((1L << bits) - 1)
    val xm = BitwiseAnd(Cast(children(0), LongType), mask)
    val ym = BitwiseAnd(Cast(children(1), LongType), mask)
    (0 until bits).map { i =>
      BitwiseOr(
        ShiftLeft(BitwiseAnd(ShiftRight(xm, Literal(i)), Literal(1L)),
          Literal(2 * i)),
        ShiftLeft(BitwiseAnd(ShiftRight(ym, Literal(i)), Literal(1L)),
          Literal(2 * i + 1)))
    }.reduce(BitwiseOr(_, _))
  }

  /** Write `df` z-clustered on (xCol, yCol): range-partition by the
    * z-value into `numFiles` output files, sort within each — every
    * file covers a disjoint z range, narrow per-file min/max on both
    * source dimensions. The working column name is collision-checked
    * and dropped before write. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
                    yCol: String, numFiles: Int, bits: Int = 16): Unit = {
    val z = Iterator.from(0).map(i => s"_graft_z$i")
      .filterNot(df.columns.contains(_)).next()
    df.withColumn(z, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

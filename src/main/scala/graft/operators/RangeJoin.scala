package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as a nested-loop —
  * broadcast when one side is tiny (fine for a literal band table,
  * see Relational.priceBandCounts), but quadratic disaster when both
  * sides are facts. The standard scale formulation bins the domain:
  * each interval replicates to the fixed-width bins it overlaps, each
  * point maps to exactly one bin, and the join becomes an EQUI-join
  * on the bin key (hash exchange both sides, AQE-eligible) with a
  * residual interval filter. Replication factor = average interval
  * span / binWidth, a tunable constant — so cost is linear in inputs,
  * not |P|×|I|. Same idea as interval/bin-bucketed joins in the
  * spatial- and temporal-join literature.
  */
object RangeJoin {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val TableIdent = "^[A-Za-z_][A-Za-z0-9_.]*$".r

  /** SQL table-valued form, registered as `graft_rangejoin` via the
    * session extensions and `GraftFunctions.register`:
    * {{{ SELECT * FROM graft_rangejoin('pts', 'iv', 'p', 'lo', 'hi', '10.0') }}}
    * Arguments are string literals: points table/view, intervals
    * table/view, point column, lo column, hi column, binWidth, then
    * optionally maxBinsPerInterval. Output = point columns then
    * interval columns (the working bin key is projected away).
    *
    * Implementation: the builder VALIDATES the identifiers, renders
    * the same binned-equi-join shape [[pointInInterval]] declares,
    * and parses it with `CatalystSqlParser` — one formulation, no
    * hand-built analyzer-fragile trees. */
  def tableFunction(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def str(i: Int): String = args(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_rangejoin: argument ${i + 1} must be a string literal, got $other")
    }
    require(args.length == 6 || args.length == 7,
      "graft_rangejoin(points, intervals, pointCol, loCol, hiCol, binWidth[, maxBins])")
    val (pt, it) = (str(0), str(1))
    Seq(pt, it).foreach(t => require(TableIdent.findFirstIn(t).isDefined,
      s"graft_rangejoin: invalid table name '$t'"))
    val Seq(p, lo, hi) = Seq(str(2), str(3), str(4))
    Seq(p, lo, hi).foreach(c => require(Ident.findFirstIn(c).isDefined,
      s"graft_rangejoin: invalid column name '$c'"))
    val bw = str(5).toDouble
    require(bw > 0, "graft_rangejoin: binWidth must be positive")
    val cap = if (args.length == 7) str(6).toLong else 1L << 20
    require(cap > 0, "graft_rangejoin: maxBinsPerInterval must be positive")
    val sql =
      s"""SELECT gp.* EXCEPT (_graft_bin), gi.* EXCEPT (_graft_bin)
         |FROM (SELECT *, CAST(floor($p / $bw) AS BIGINT) AS _graft_bin
         |      FROM $pt) gp
         |JOIN (SELECT *, explode(CASE
         |        WHEN CAST(floor($hi / $bw) AS BIGINT)
         |             - CAST(floor($lo / $bw) AS BIGINT) < $cap
         |        THEN sequence(CAST(floor($lo / $bw) AS BIGINT),
         |                      CAST(floor($hi / $bw) AS BIGINT))
         |        ELSE raise_error(concat(
         |          'graft_rangejoin: interval [', $lo, ', ', $hi,
         |          ') spans more than $cap bins of width $bw'))
         |        END) AS _graft_bin
         |      FROM $it) gi
         |  ON gp._graft_bin = gi._graft_bin
         | AND gp.$p >= gi.$lo AND gp.$p < gi.$hi""".stripMargin
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(sql)
  }

  /** SQL table-valued form of [[intervalOverlap]], registered as
    * `graft_overlapjoin`:
    * {{{ SELECT * FROM graft_overlapjoin('l', 'r', 'lo1','hi1','lo2','hi2', '10.0') }}}
    * Same validation + parse strategy as [[tableFunction]]; output =
    * left columns then right columns (bin key projected away). The
    * anchor-bin filter gives exact-once pairs, as in the Column API. */
  def overlapTableFunction(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def str(i: Int): String = args(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_overlapjoin: argument ${i + 1} must be a string literal, got $other")
    }
    require(args.length == 7 || args.length == 8,
      "graft_overlapjoin(left, right, lLo, lHi, rLo, rHi, binWidth[, maxBins])")
    val (lt, rt) = (str(0), str(1))
    Seq(lt, rt).foreach(t => require(TableIdent.findFirstIn(t).isDefined,
      s"graft_overlapjoin: invalid table name '$t'"))
    val Seq(lLo, lHi, rLo, rHi) = (2 to 5).map(str)
    Seq(lLo, lHi, rLo, rHi).foreach(c => require(Ident.findFirstIn(c).isDefined,
      s"graft_overlapjoin: invalid column name '$c'"))
    val bw = str(6).toDouble
    require(bw > 0, "graft_overlapjoin: binWidth must be positive")
    val cap = if (args.length == 8) str(7).toLong else 1L << 20
    require(cap > 0, "graft_overlapjoin: maxBinsPerInterval must be positive")
    def side(t: String, lo: String, hi: String): String =
      s"""(SELECT *, explode(CASE
         |    WHEN CAST(floor($hi / $bw) AS BIGINT)
         |         - CAST(floor($lo / $bw) AS BIGINT) < $cap
         |    THEN sequence(CAST(floor($lo / $bw) AS BIGINT),
         |                  CAST(floor($hi / $bw) AS BIGINT))
         |    ELSE raise_error(concat(
         |      'graft_overlapjoin: interval [', $lo, ', ', $hi,
         |      ') spans more than $cap bins of width $bw'))
         |    END) AS _graft_bin
         |  FROM $t)""".stripMargin
    val sql =
      s"""SELECT gl.* EXCEPT (_graft_bin), gr.* EXCEPT (_graft_bin)
         |FROM ${side(lt, lLo, lHi)} gl
         |JOIN ${side(rt, rLo, rHi)} gr
         |  ON gl._graft_bin = gr._graft_bin
         | AND gl.$lLo < gr.$rHi AND gr.$rLo < gl.$lHi
         | AND gl._graft_bin =
         |     CAST(floor(greatest(gl.$lLo, gr.$rLo) / $bw) AS BIGINT)""".stripMargin
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(sql)
  }

  /** Join `points` to every `intervals` row whose [loCol, hiCol)
    * half-open range contains the point. Output = point columns then
    * interval columns (minus the internal bin key).
    *
    * `binWidth` trades replication (intervals spanning many bins) for
    * bin selectivity (many intervals per bin); pick ~ the median
    * interval span. The end bin of an interval is included even when
    * `hi` sits exactly on a bin edge — the residual filter removes
    * the false pair, keeping binning correct for any alignment.
    *
    * `maxBinsPerInterval` caps the per-interval replication: one
    * outlier interval spanning the whole domain with a tiny
    * `binWidth` would otherwise materialize a span/binWidth-element
    * array per row before exploding. An interval exceeding the cap
    * fails the job with a clear message (raise the cap or widen the
    * bins) rather than silently OOMing an executor. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    // unique working-column name: never collide with (or silently
    // drop) a caller column that happens to be named the same
    val bin = {
      val taken = (points.columns ++ intervals.columns).toSet
      Iterator.from(0).map(i => s"_graft_bin$i").filterNot(taken).next()
    }
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val binned = points
      .withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    val exploded = intervals
      .withColumn(bin, explode(when(
        hiBin - loBin < lit(maxBinsPerInterval), sequence(loBin, hiBin))
        .otherwise(raise_error(concat(
          lit(s"RangeJoin.pointInInterval: interval ["), col(loCol),
          lit(", "), col(hiCol),
          lit(s") spans more than $maxBinsPerInterval bins of width " +
            s"$binWidth; raise maxBinsPerInterval or widen binWidth"))))))
    binned
      .join(exploded, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }

  /** Interval-overlap join: pair every `left` row with every `right`
    * row whose half-open ranges intersect (`lLo < rHi && rLo < lHi`).
    * Column sets must be disjoint — rename before joining.
    *
    * Both sides replicate to their covered bins and equi-join on the
    * bin, turning the inequality join linear in coverage where a
    * nested loop is |L|×|R|. A pair sharing k bins would match k
    * times; instead of a distinct over the output, each pair is kept
    * only in its ANCHOR bin — the bin of `greatest(lLo, rLo)`, the
    * first bin where both intervals are present — so the join emits
    * each pair exactly once by construction (no dedup exchange).
    * `maxBinsPerInterval` caps per-row replication exactly as in
    * [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalOverlap: column collision ${overlap.mkString(", ")} — rename first")
    val bin = {
      val taken = (left.columns ++ right.columns).toSet
      Iterator.from(0).map(i => s"_graft_bin$i").filterNot(taken).next()
    }
    def binsOf(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loBin = floor(col(lo) / binWidth).cast("long")
      val hiBin = floor(col(hi) / binWidth).cast("long")
      df.withColumn(bin, explode(when(
        hiBin - loBin < lit(maxBinsPerInterval), sequence(loBin, hiBin))
        .otherwise(raise_error(concat(
          lit("RangeJoin.intervalOverlap: interval ["), col(lo),
          lit(", "), col(hi),
          lit(s") spans more than $maxBinsPerInterval bins of width " +
            s"$binWidth; raise maxBinsPerInterval or widen binWidth"))))))
    }
    binsOf(left, lLo, lHi)
      .join(binsOf(right, rLo, rHi), Seq(bin))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col(bin) ===
        floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop(bin)
  }

  /** Grid-bucketed ε-join (2-D fixed-radius neighbor stats): for each
    * point, how many OTHER-group points of the same partition key sit
    * within Euclidean distance `r`, and how close is the nearest —
    * the co-location / contact-pattern primitive (same-minute spatial
    * proximity, co-visits, sensor coincidence).
    *
    * `points` columns: `id` (unique long), `grp` (pairs within one
    * group are ignored — e.g. the same user), `part` (hard partition
    * key — e.g. the minute bucket; only same-`part` pairs pair), `x`,
    * `y` (non-negative ints). Output: (id, n_nbr, min_d2) for points
    * with ≥ 1 neighbor.
    *
    * Scale shape: cells of side `r` make the candidate join an
    * EQUI-join on (part, cellx, celly) — the build side keys to its
    * home cell once, the probe side explodes to its 3×3 neighborhood
    * (a fixed ×9 on ids-and-coords rows, not payloads), and any pair
    * within `r` shares the probe's neighborhood by construction while
    * each candidate is found exactly once per direction (the build
    * point has ONE home cell); `probe.id < build.id` keeps one
    * direction, the residual integer d² ≤ r² filter is exact. Cost is
    * Σ cell-occupancy², never |P|² — the same bin-the-domain move as
    * [[pointInInterval]], lifted to 2-D. */
  def gridEpsilonJoin(points: DataFrame, r: Int): DataFrame = {
    require(r > 0, s"gridEpsilonJoin: radius must be positive, got $r")
    val home = points.select(col("id"), col("grp"), col("part"),
      col("x"), col("y"),
      expr(s"x div $r").as("cx"), expr(s"y div $r").as("cy"))
    val probe = home.select(col("id").as("id1"), col("grp").as("g1"),
        col("part"), col("x").as("x1"), col("y").as("y1"),
        explode(sequence(col("cx") - 1, col("cx") + 1)).as("cx"),
        col("cy"))
      .select(col("id1"), col("g1"), col("part"), col("x1"), col("y1"),
        col("cx"),
        explode(sequence(col("cy") - 1, col("cy") + 1)).as("cy"))
    val d2 = (col("x1") - col("x")) * (col("x1") - col("x")) +
      (col("y1") - col("y")) * (col("y1") - col("y"))
    val pairs = probe.join(home, Seq("part", "cx", "cy"))
      .filter(col("id1") < col("id") && col("g1") =!= col("grp") &&
        d2 <= lit(r * r))
      .select(col("id1"), col("id").as("id2"), d2.as("d2"))
    pairs.select(explode(array(
        struct(col("id1").as("event_id"), col("d2")),
        struct(col("id2").as("event_id"), col("d2")))).as("s"))
      .select(col("s.event_id"), col("s.d2"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nbr"), min(col("d2")).as("min_d2"))
  }
}

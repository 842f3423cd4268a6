package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Native AS-OF (temporal nearest-predecessor) join — the one
  * whole-operator the reference's analytics need that Spark's logical
  * algebra genuinely lacks (SURVEY §7.3 ladder rung (c): LogicalPlan +
  * Strategy + SparkPlan via SparkSessionExtensions).
  *
  * Semantics: for every left row, attach the right row with the same
  * key whose time is the greatest not exceeding (or strictly below,
  * with `strict`) the left row's time, within an optional tolerance.
  * Unmatched left rows keep nulls on the right — a LEFT OUTER as-of.
  *
  * Scale design — why a custom operator instead of composition:
  * the compositional forms either union both sides and run a
  * last-ignoring-nulls window over the merged stream (materializes
  * and window-sorts |L|+|R| rows — see TimeSeries.asofPurchaseClick)
  * or range-join then rank (|L|×|R| worst case). This exec is the
  * sort-merge shape: ONE hash exchange per side on the key, ONE sort
  * per side by (key, time) — both provided declaratively through
  * requiredChildDistribution/Ordering so EnsureRequirements plans
  * (and AQE coalesces) them like any other join — then a single
  * streaming merge pass per partition holding exactly one candidate
  * row of state. At 100 TB: no replication, no quadratic expansion,
  * spill-friendly sorts, and the right side advances monotonically so
  * each input row is touched once.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean, toleranceUs: Option[Long])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Injected via
  * [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, strict, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the key, both sides sorted
  * by (key, time); one forward merge pass per partition. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean, toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val isStrict = strict
    val tol = toleranceUs
    val nRight = rightOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      // parents (and SparkPlan.getByteArrayRdd when this exec is the
      // collect root) expect UnsafeRow — project the JoinedRow out.
      // Project the OUTPUT attributes (right side nullability-fixed):
      // binding the raw right attrs would let codegen skip null
      // checks over the all-null unmatched row
      val resultProj = UnsafeProjection.create(
        leftOut ++ rightOut.map(_.withNullability(true)),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(nRight)
      var curKey: UnsafeRow = null
      var candidate: InternalRow = null
      var candTime = 0L
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull) {
          // SQL equi-join semantics: a null key matches nothing (the
          // natural row ordering would treat null==null as equal).
          // Null keys sort first, so no state has accrued yet.
          resultProj(joined(lRow, nullRight))
        } else {
        if (curKey == null || keyOrd.compare(lKey, curKey) != 0) {
          curKey = lKey.copy()
          candidate = null
        }
        val lTimeRow = lTimeProj(lRow)
        if (lTimeRow.isNullAt(0)) {
          resultProj(joined(lRow, nullRight))
        } else {
          val lT = lTimeRow.getLong(0)
          // Consume right rows whose (key, time) can never serve a
          // later left row better than they serve this one: keys
          // before ours, or our key with an admissible time. Within
          // a key both sides' times ascend, so consumption is safe.
          var scan = true
          while (scan && rBuf.hasNext) {
            val rRow = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(rRow), curKey)
            if (cmp < 0) { rBuf.next(); () }
            else if (cmp == 0) {
              val rTimeRow = rTimeProj(rRow)
              if (rTimeRow.isNullAt(0)) { rBuf.next(); () }
              else {
                val rT = rTimeRow.getLong(0)
                if (if (isStrict) rT < lT else rT <= lT) {
                  candidate = rRow.copy()
                  candTime = rT
                  rBuf.next(); ()
                } else scan = false
              }
            } else scan = false
          }
          val ok = candidate != null && tol.forall(t => lT - candTime <= t)
          resultProj(joined(lRow, if (ok) candidate else nullRight))
        }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public DataFrame-level API for the native as-of join. */
object AsOfJoin {

  /** SQL table-valued form, registered via
    * `injectTableFunction` in [[GraftExtensions]]:
    * {{{ SELECT * FROM graft_asof('trades', 'quotes', 'sym', 'tt', 'qt') }}}
    * Arguments are string literals: left table/view, right table/view,
    * comma-separated key columns, left time column, right time column,
    * then optionally 'strict'|'inclusive' and a tolerance in micros.
    * Left and right must be DIFFERENT relations (use distinctly-named
    * views of the same table; generic analyzer dedup cannot split a
    * custom node's expressions between sides). */
  def tableFunction(args: Seq[Expression]): LogicalPlan = {
    def str(i: Int): String = args(i) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"graft_asof: argument ${i + 1} must be a string literal, got $other")
    }
    require(args.length >= 5 && args.length <= 7,
      "graft_asof(left, right, keys, leftTime, rightTime[, mode[, tolUs]])")
    val strict = if (args.length >= 6) {
      str(5).toLowerCase match {
        case "strict"    => true
        case "inclusive" => false
        case other => throw new IllegalArgumentException(
          s"graft_asof: mode must be 'strict' or 'inclusive', got '$other'")
      }
    } else false
    val tol = if (args.length == 7) Some(str(6).toLong) else None
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    val keys = str(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "graft_asof: at least one key column")
    // qualify every column with its side's relation name: the key
    // columns exist on BOTH children, and generic reference
    // resolution over a custom node has no side information
    val lq = str(0).split("\\.").last
    val rq = str(1).split("\\.").last
    AsOfJoinPlan(
      UnresolvedRelation(str(0).split("\\.").toSeq),
      UnresolvedRelation(str(1).split("\\.").toSeq),
      keys.map(k => UnresolvedAttribute(Seq(lq, k))),
      keys.map(k => UnresolvedAttribute(Seq(rq, k))),
      UnresolvedAttribute(Seq(lq, str(3))),
      UnresolvedAttribute(Seq(rq, str(4))),
      strict, tol)
  }

  /** Left as-of join `left` with `right` on equal `on` columns,
    * matching the latest right row whose `rightTimeCol` ≤ (or <, when
    * `strict`) the left row's `leftTimeCol`. Time columns must be
    * LongType (epoch micros by graft convention). Right columns keep
    * their names — rename before joining if they collide with left.
    *
    * TIE SEMANTICS: if the right side has several rows with the SAME
    * (key, time), the merge pass keeps whichever one the (unstable,
    * partitioning-dependent) sort emits last — i.e. AN ARBITRARY
    * duplicate, nondeterministic across runs. For deterministic
    * results, pre-aggregate the right side to unique (key, time)
    * first (the convention every shipped caller follows, e.g.
    * TimeSeries.asofNative reduces with max per (key, time)), or
    * dedup with a ranking window on an explicit tiebreak column.
    *
    * The right plan is re-aliased with fresh expression ids, so
    * self-joins (two filtered views of one table) are safe. */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           strict: Boolean = false,
           toleranceUs: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "asof: at least one key column is required")
    val spark = left.sparkSession
    val lPlan = Bridge.analyzed(left)
    val rAnalyzed = Bridge.analyzed(right)
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    def timeAttr(plan: LogicalPlan, name: String): Attribute = {
      val a = attr(plan, name)
      require(a.dataType == LongType,
        s"asof: time column '$name' must be LongType, got ${a.dataType.simpleString}")
      a
    }
    val lKeys = on.map(attr(lPlan, _))
    val rKeys = on.map(attr(rPlan, _))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asof: key type mismatch ${l.name}: ${l.dataType.simpleString} vs ${r.dataType.simpleString}")
    }
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys,
      timeAttr(lPlan, leftTimeCol), timeAttr(rPlan, rightTimeCol),
      strict, toleranceUs))
  }

  /** Forward as-of: match the EARLIEST right row at-or-after (or
    * strictly after) the left row's time. Same merge machinery — the
    * time axis is negated on both sides before the backward join, so
    * "latest ≤ -t" is "earliest ≥ t". */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTimeCol: String, rightTimeCol: String,
                  strict: Boolean = false,
                  toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val negL = "__graft_neg_lt"
    val negR = "__graft_neg_rt"
    require(!left.columns.contains(negL) && !right.columns.contains(negR),
      s"asofForward: reserved column name $negL/$negR already present")
    asof(
      left.withColumn(negL, -col(leftTimeCol)),
      right.withColumn(negR, -col(rightTimeCol)),
      on, negL, negR, strict, toleranceUs)
      .drop(negL, negR)
  }
}

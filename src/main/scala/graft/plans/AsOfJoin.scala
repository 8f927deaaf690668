package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** Native backward as-of join: for every left (fact) row, attach the
  * LATEST right (dimension-version) row with equal key and
  * `rightTime <= leftTime`, or nulls when none exists (left-outer).
  *
  * Spark has no as-of join; the composed alternative (equi-join on the
  * key + interval filter, see q15) materializes EVERY version of the key
  * before filtering — fine when versions-per-key is small, O(versions)
  * blowup when it isn't. This operator is the full custom-operator stack
  * of SURVEY §7.5(c): a logical node, a planner strategy, and a physical
  * exec that declares hash distribution + (key, time) ordering so
  * EnsureRequirements plans ONE co-partitioned sort on each side, then
  * streams both sorted partitions with a two-pointer merge — O(n+m) per
  * partition, zero row amplification, never rewinds.
  *
  * The DuckDB oracle replays it with the built-in `ASOF LEFT JOIN`
  * (q30), pinning the semantics against an independent implementation.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  // mismatched types would make the merge's row comparators read garbage
  // (no implicit-cast insertion runs for a custom node) — fail fast
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types differ: ${leftKeys.map(_.dataType)} vs " +
      s"${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joiner = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead state over the sorted right side
        private var rNextKey: InternalRow = _
        private var rNextTime: InternalRow = _
        private var rNextRow: InternalRow = _
        private def advanceRight(): Unit = {
          // equi-join semantics: NULL keys never match, so null-keyed
          // right rows are skipped outright (natural row ordering would
          // otherwise treat NULL == NULL as a match)
          var advanced = false
          while (!advanced) {
            if (rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              val t = rTimeProj(r)
              // NULL keys never equi-match; NULL version times never
              // satisfy `vt <= ft` under SQL 3-valued logic (natural row
              // ordering would otherwise sort NULL first and make such a
              // row the candidate for everything)
              if (!k.anyNull && !t.anyNull) {
                rNextRow = r.copy()
                rNextKey = k.copy()
                rNextTime = t.copy()
                advanced = true
              }
            } else {
              rNextRow = null; rNextKey = null; rNextTime = null
              advanced = true
            }
          }
        }
        advanceRight()
        // latest right row consumed for the current key (the candidate)
        private var candKey: InternalRow = _
        private var candRow: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lk.anyNull) return joiner(l, nullRight) // NULL key: no match
          val lt = lTimeProj(l)
          if (lt.anyNull) return joiner(l, nullRight) // NULL time: no match
          // consume right rows that are (key < lk) or
          // (key == lk && time <= lt); the last equal-key one consumed is
          // the as-of candidate
          var continue = rNextRow != null
          while (continue) {
            val c = keyOrd.compare(rNextKey, lk)
            if (c < 0) {
              advanceRight()
              continue = rNextRow != null
            } else if (c == 0 && timeOrd.compare(rNextTime, lt) <= 0) {
              candKey = rNextKey
              candRow = rNextRow
              advanceRight()
              continue = rNextRow != null
            } else continue = false
          }
          val matched =
            candRow != null && keyOrd.compare(candKey, lk) == 0
          joiner(l, if (matched) candRow else nullRight)
        }
      }
    }
  }
}

/** User-facing API. */
object AsOfJoin {

  /** Register the planner strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join of `facts` against `versions`: latest version
    * with `versionTime <= factTime` per key, left-outer.
    */
  def backward(
      facts: DataFrame,
      versions: DataFrame,
      factKeys: Seq[Column],
      versionKeys: Seq[Column],
      factTime: Column,
      versionTime: Column): DataFrame = {
    val spark = facts.sparkSession
    register(spark)
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      ColumnBridge.logicalPlan(facts),
      ColumnBridge.logicalPlan(versions),
      factKeys.map(ColumnBridge.expression),
      versionKeys.map(ColumnBridge.expression),
      ColumnBridge.expression(factTime),
      ColumnBridge.expression(versionTime)))
  }

  /** Forward as-of join: EARLIEST version with `versionTime >= factTime`
    * per key, left-outer. Reduced to [[backward]] by order reversal —
    * both time columns are mapped to negated epoch microseconds, so the
    * backward exec's "largest value <= t" becomes "smallest value >= t"
    * with the identical co-partitioned two-pointer physical plan.
    */
  def forward(
      facts: DataFrame,
      versions: DataFrame,
      factKeys: Seq[Column],
      versionKeys: Seq[Column],
      factTime: Column,
      versionTime: Column): DataFrame = {
    import org.apache.spark.sql.functions.{negate, unix_micros}
    def neg(c: Column): Column = negate(unix_micros(c.cast("timestamp")))
    // the custom plan node resolves ATTRIBUTES only (no analyzer pass
    // runs over its expressions), so the negated time is materialized as
    // a projected column on each side and dropped from the result
    val f = facts.withColumn("__asof_fneg", neg(factTime))
    val v = versions.withColumn("__asof_vneg", neg(versionTime))
    backward(f, v, factKeys, versionKeys, f("__asof_fneg"), v("__asof_vneg"))
      .drop("__asof_fneg", "__asof_vneg")
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.LongType

/** Backward as-of join as a first-class Catalyst operator — tier (c)
  * of the custom-operator ladder (SURVEY.md §4): LogicalPlan +
  * SparkStrategy + SparkPlan, registered per-session via
  * `spark.experimental.extraStrategies` (and GraftExtensions).
  *
  * Semantics: for every left row, the LAST right row (by right
  * ordering (time, tiebreaks...)) with equal keys and
  * right.time <= left.time; left-outer (unmatched left rows carry
  * nulls). This is pandas merge_asof(direction='backward') /
  * QuestDB-KDB ASOF JOIN semantics, built from public descriptions.
  *
  * Why a custom physical operator beats the tier-(a) union+window
  * formulation (operators/Advanced.asofJoin):
  *  - each side shuffles ON ITS OWN KEY once (EnsureRequirements
  *    inserts hash exchanges from requiredChildDistribution) and is
  *    sorted by (key, time) — then ONE streaming merge pass with
  *    O(1) state per partition: no union materialization, no window
  *    buffer, no per-row last_value aggregation machinery;
  *  - the whole right ROW rides along (here: the matched click's id
  *    AND timestamp); the window form needs one extra last_value(...)
  *    aggregation per carried column;
  *  - memory is one retained right row per key group, independent of
  *    group size — a 10^9-row hot key streams through instead of
  *    occupying a window buffer.
  *
  * Scale posture: identical shuffle count to a sort-merge join (the
  * minimum possible for co-locating two fact tables), AQE-compatible,
  * and the merge never holds more than one buffered row.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreaks: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, rtb) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rtb) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreaks: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both sides clustered on their keys — EnsureRequirements inserts
    * compatible hash exchanges (or reuses existing ones), exactly as
    * for SortMergeJoin. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys..., time) ascending on both sides; the right side
    * additionally sorts by the tiebreaks so "last match among equal
    * times" is deterministic. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (rightTime +: rightTiebreaks).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeEval = BindReferences.bindReference(lt, lOut)
      val rTimeEval = BindReferences.bindReference(rt, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTimeV: Long = 0L
        private var rValid = false
        private var lastMatch: InternalRow = _     // copy, current key only
        private var lastMatchKey: InternalRow = _  // copy

        private def advanceRight(): Unit = {
          rValid = false
          // skip right rows with a null time (never "the last row at
          // or before" anything) or a null key (SQL equi-join
          // semantics: NULL matches nothing, unlike the natural
          // ordering which would compare null == null)
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            val t = rTimeEval.eval(rRow)
            if (t != null) {
              val k = rKeyProj(rRow)
              if (!k.anyNull) {
                rKey = k.copy()
                rTimeV = t.asInstanceOf[Long]
                rValid = true
              }
            }
          }
        }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeObj = lTimeEval.eval(lRow)
          if (lTimeObj == null || lKey.anyNull) {
            // null left time or null key matches nothing (outer nulls)
            return resultProj(joined(lRow, nullRight))
          }
          val lTimeV = lTimeObj.asInstanceOf[Long]
          // drop right rows for keys before the current left key
          while (rValid && keyOrd.compare(rKey, lKey) < 0) advanceRight()
          // consume right rows of this key up to the left time; the
          // LAST one wins (right is sorted by (time, tiebreaks))
          while (rValid && keyOrd.compare(rKey, lKey) == 0 &&
              rTimeV <= lTimeV) {
            lastMatch = rRow.copy()
            lastMatchKey = rKey
            advanceRight()
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0
          resultProj(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Backward as-of join: for each left row, the last right row (by
    * (rightTime, rightTiebreaks...) ascending) with equal keys and
    * rightTime <= leftTime. Left-outer. Time columns must be LongType
    * (epoch micros/nanos — convert timestamps with unix_micros).
    *
    * The right side is re-aliased internally so self-joins (both
    * sides from one source) cannot collide on expression ids. */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTiebreaks: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    // fresh expr-ids on the right so self-joins resolve unambiguously
    val rightFresh = right.select(
      right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = Shim.analyzed(left)
    val rPlan = Shim.analyzed(rightFresh)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column $name not in ${plan.output.map(_.name)}"))
    val lt = resolve(lPlan, leftTime)
    val rt = resolve(rPlan, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"asof: time columns must be LongType, got ${lt.dataType}/${rt.dataType}")
    Shim.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
      lt, rt, rightTiebreaks.map(resolve(rPlan, _))))
  }
}

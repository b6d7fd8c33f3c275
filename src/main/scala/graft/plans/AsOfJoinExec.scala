package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, graftbridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join — the custom-operator ladder's LAST rung (logical
  * node + planner strategy + physical operator), exercised alongside the
  * composition-based [[graft.operators.AsOf.asofJoin]] which remains the
  * first-rung reference implementation.
  *
  * Physical contract: both children are hash-clustered on their key and
  * sorted by (key, time) — EnsureRequirements inserts the exchanges and
  * sorts, exactly as for a sort-merge join — then each co-partition pair
  * runs a single-pass streaming merge: the right pointer only ever
  * advances, carrying the most recent right row per key, so a partition
  * is joined in O(|left| + |right|) with O(1) state beyond the one
  * carried row. That is the same cost envelope as the window-composition
  * form but with no null-tagged union materialized and no window buffer —
  * at 100 TB the shuffle volume is each side once, the theoretical
  * minimum for a distributed as-of join.
  *
  * Matches the composition's semantics exactly: `rightTime <= leftTime`
  * within equal keys (equal timestamps match), the LAST right row at an
  * equal (key, time) wins (both inputs sort with a deterministic
  * tiebreak upstream is NOT assumed — ties resolve to the right row the
  * sort delivered last, so q87 orders right values as a final sort key
  * the same way q39's struct tiebreak does), null keys/times never
  * match (SQL equi-join null semantics).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * [[graft.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "matched rows"))

  // hash-cluster each side on its key; EnsureRequirements co-partitions
  // the pair (same mechanism as sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeB =
      BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyB =
      BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeB =
      BindReferences.bindReference(rightTime: Expression, right.output)
    val rvAttrs = rightValues
    // the output carries right values AS NULLABLE (unmatched rows);
    // projecting through the original non-nullable attributes would skip
    // the null check and read primitive zeros out of the all-null row
    val rvNullable = rightValues.map(_.withNullability(true))
    val rOut = right.output
    val lOut = left.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rvProj = UnsafeProjection.create(rvAttrs: Seq[Expression], rOut)
      val resultProj = UnsafeProjection.create(
        (lOut ++ rvNullable): Seq[Expression], lOut ++ rvNullable)
      val nullRv = new GenericInternalRow(rvAttrs.length)
      val joined = new JoinedRow
      // streaming right-side state: the lookahead row (decoded key/time)
      // and the most recent match for the key it belongs to
      var rRow: InternalRow = null
      var rKey: Any = null
      var rTime: Any = null
      var haveR = false
      var lastRv: InternalRow = null
      var lastRvKey: Any = null
      def advanceRight(): Unit = {
        haveR = false
        while (!haveR && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyB.eval(r)
          val t = rTimeB.eval(r)
          if (k != null && t != null) { // null key/time never matches
            rRow = r; rKey = k; rTime = t; haveR = true
          }
        }
      }
      advanceRight()
      lIter.map { lRow =>
        val lKey = lKeyB.eval(lRow)
        val lTime = lTimeB.eval(lRow)
        if (lKey != null && lTime != null) {
          // consume right rows at or before (lKey, lTime); the row
          // iterator reuses its buffer, so the carried match is a copy
          // of the PROJECTED right values only, never the full row
          var go = haveR
          while (go) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
              lastRv = rvProj(rRow).copy()
              lastRvKey = rKey
              advanceRight()
            } else go = false
            if (!haveR) go = false
          }
        }
        outRows += 1
        val hit = lKey != null && lastRv != null &&
          keyOrd.compare(lastRvKey, lKey) == 0
        if (hit) matched += 1
        resultProj(joined(lRow, if (hit) lastRv else nullRv))
      }
    }
  }
}

/** DataFrame-level entry point for the native operator. */
object AsOfJoinNative {
  /** As-of join via [[AsOfJoinExec]]: for each left row, the most recent
    * right row with `rightTime <= leftTime` on the same `key`, appending
    * `rightValues`. Same contract (and the same clash check) as the
    * composed [[graft.operators.AsOf.asofJoin]]. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    val clash = rightValues.filter(left.columns.contains)
    require(clash.isEmpty,
      s"rightValues ${clash.mkString(", ")} already exist on the left " +
        "side; rename them before the as-of join")
    val lPlan = graftbridge.analyzed(left)
    val rPlan = graftbridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n not found in ${p.output.map(_.name)}"))
    require(
      attr(lPlan, key).dataType == attr(rPlan, key).dataType,
      "as-of key types must match")
    require(
      attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      "as-of time types must match")
    graftbridge.ofRows(
      left.sparkSession,
      AsOfJoinPlan(
        lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTime), attr(rPlan, rightTime),
        rightValues.map(attr(rPlan, _))))
  }
}

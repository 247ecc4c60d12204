package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — rung (c) of SURVEY §7.3's custom-operator
  * ladder: a custom LogicalPlan node, a SparkStrategy, and a physical
  * SparkPlan, registered through SparkSessionExtensions
  * ([[GraftExtensions]]).
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] (LEFT as-of: each left
  * row gets the latest right row with the same key and ts <= left ts, ties
  * inclusive). The physical shape is a streamed MERGE join: both children
  * hash-cluster by key and sort by (key, ts) — the SAME one-shuffle-per-
  * side cost as the composed window form — but the merge consumes the
  * right side with a single forward-moving cursor and retains ONE
  * projected payload per key, where the window form materializes the
  * unioned rows through a window buffer. At 100 TB both children are
  * plain exchanges; nothing pairwise ever materializes.
  *
  * Restriction (deliberate): keys and timestamps must evaluate to
  * integral/timestamp internals (Long/Int) — the event-pipeline shape.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    keyL: Attribute, keyR: Attribute, tsL: Attribute, tsR: Attribute,
    payload: Seq[NamedExpression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.toAttribute.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfMergeJoinExec(n.keyL, n.keyR, n.tsL, n.tsR, n.payload, n.output,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    keyL: Attribute, keyR: Attribute, tsL: Attribute, tsR: Attribute,
    payload: Seq[NamedExpression], override val output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // one shuffle per side, co-partitioned by key (EnsureRequirements aligns
  // the two ClusteredDistributions exactly as it does for sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyL)) :: ClusteredDistribution(Seq(keyR)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending)),
      // payload columns break (key, ts) ties on the right: without them
      // duplicate-timestamp right rows would make which payload "wins"
      // depend on shuffle-internal order — nondeterministic output
      Seq(SortOrder(keyR, Ascending), SortOrder(tsR, Ascending)) ++
        payload.map(p => SortOrder(p.toAttribute, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(keyL, Ascending), SortOrder(tsL, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"as-of merge join requires integral key/ts internals, got ${other.getClass}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val payloadExprs = payload
    val outAttrs = output
    val (klA, krA, tlA, trA) = (keyL, keyR, tsL, tsR)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(klA.asInstanceOf[Expression], leftOut)
      val lTs = BindReferences.bindReference(tlA.asInstanceOf[Expression], leftOut)
      val rKey = BindReferences.bindReference(krA.asInstanceOf[Expression], rightOut)
      val rTs = BindReferences.bindReference(trA.asInstanceOf[Expression], rightOut)
      val payloadProj = UnsafeProjection.create(
        payloadExprs.map(_.asInstanceOf[Expression]), rightOut)
      // payload ordinals MUST bind nullable: unmatched left rows read from
      // the all-null payload row, and a non-nullable binding would skip the
      // null check and materialize zeros
      val resultProj = UnsafeProjection.create(
        outAttrs.map(_.asInstanceOf[Expression]),
        leftOut ++ payloadExprs.map(_.toAttribute.withNullability(true)))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadExprs.size)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var haveCur = false
        private var curKey = 0L
        private var curPayload: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkAny = lKey.eval(l)
          val ltAny = lTs.eval(l)
          if (lkAny == null || ltAny == null) {
            // null key/ts never matches; NULLS FIRST ordering means no
            // right rows need consuming for these rows
            return resultProj(joined(l, nullPayload))
          }
          val lk = asLong(lkAny)
          val lt = asLong(ltAny)
          // advance the right cursor through every row usable by this (and
          // any later) left row: key strictly behind, or same key with
          // ts <= left ts; retain only the latest projected payload
          var continue = true
          while (continue) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next()
              else continue = false
            }
            if (rHead != null) {
              val rkAny = rKey.eval(rHead)
              val rtAny = rTs.eval(rHead)
              if (rkAny == null || rtAny == null) {
                rHead = null // unmatched by definition; skip
              } else {
                val rk = asLong(rkAny)
                val rt = asLong(rtAny)
                if (rk < lk || (rk == lk && rt <= lt)) {
                  haveCur = true
                  curKey = rk
                  curPayload = payloadProj(rHead).copy()
                  rHead = null
                } else {
                  continue = false
                }
              }
            }
          }
          val p = if (haveCur && curKey == lk) curPayload else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }
}

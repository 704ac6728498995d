package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a first-class plan node (SURVEY §7.2 extension path (c)):
  * for every left row, the latest right row with `rightTime` < (or ≤)
  * `leftTime` in the same key group.
  *
  * The composed formulation (equi-join on keys + row_number window)
  * materializes EVERY (left, right-before-it) pair before ranking —
  * O(n·m) per key group in shuffle and state. This operator instead
  * demands both children hash-clustered on the keys and sorted by
  * (keys, time), then performs a single forward merge per partition:
  * O(n+m) work, O(1) state (one buffered right row), no window exchange.
  * At 100 TB that is the difference between a quadratic-in-group-size
  * shuffle and two co-partitioned sorted scans.
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean,
    /** left-outer: unmatched left rows survive with NULL right columns */
    outer: Boolean = false,
    /** max lookback in the time column's units (µs for timestamps) */
    toleranceUs: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean,
    outer: Boolean,
    toleranceUs: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val isStrict = strict; val isOuter = outer
    val tolOpt = toleranceUs
    val rWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys.map(BindReferences.bindReference(_, lOut)))
      val rKeyProj = UnsafeProjection.create(rKeys.map(BindReferences.bindReference(_, rOut)))
      val lTimeBound = BindReferences.bindReference(lTime, lOut)
      val rTimeBound = BindReferences.bindReference(rTime, rOut)
      val keyTypes = lKeys.map(_.dataType)
      val keyOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      // boxed so NULL times stay null (null.asInstanceOf[Long] would be a
      // silent 0 = epoch) — NULL-time rows are non-candidates, matching
      // the composed formulation and DuckDB ASOF
      def timeOf(e: Expression, row: InternalRow): java.lang.Long =
        e.eval(row).asInstanceOf[java.lang.Long]

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rWidth)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var lastValid: InternalRow = _   // latest right row ≤/< current left time
        private var lastValidKey: InternalRow = _
        private var lastValidTime: Long = 0L
        private var nextOut: InternalRow = _

        private def advanceRight(): Unit = {
          rHead = null; rHeadKey = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            // NULL-keyed right rows can never equi-match (SortMergeJoin
            // semantics: NULL != NULL) — skip them at the cursor so the
            // natural ordering below never pairs them with NULL left keys
            if (!rKeyProj(r).anyNull) {
              rHead = r.copy()        // unsafe rows are reused by the child
              rHeadKey = rKeyProj(rHead).copy()
            }
          }
        }
        advanceRight()

        private def computeNext(): Unit = {
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lt = timeOf(lTimeBound, l)
            if (lk.anyNull || lt == null) {
              // NULL keys never equi-match and a NULL left time has no
              // "before" — drop (inner) / null-pad (outer), matching the
              // composed equi-join formulation and DuckDB ASOF
              if (isOuter) nextOut = joined(l, nullRight)
            } else {
            // skip right groups with smaller keys (their candidates die)
            while (rHead != null && keyOrd.compare(rHeadKey, lk) < 0) {
              lastValid = null; lastValidKey = null
              advanceRight()
            }
            // consume all right rows in this key group that are before lt
            // (NULL right times sort first under Ascending and are never
            // candidates — skip without remembering them)
            while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 && {
                val rt = timeOf(rTimeBound, rHead)
                rt == null || (if (isStrict) rt < lt else rt <= lt)
              }) {
              val rt = timeOf(rTimeBound, rHead)
              if (rt != null) {
                lastValid = rHead
                lastValidKey = rHeadKey
                lastValidTime = rt
              }
              advanceRight()
            }
            val inTolerance = tolOpt.forall(t => lt - lastValidTime <= t)
            if (lastValid != null && lastValidKey != null &&
                keyOrd.compare(lastValidKey, lk) == 0 && inTolerance) {
              nextOut = joined(l, lastValid)
            } else if (isOuter) {
              nextOut = joined(l, nullRight)
            } // else: no match → inner semantics drop the left row
            }
          }
        }

        override def hasNext: Boolean = { computeNext(); nextOut != null }
        override def next(): InternalRow = {
          computeNext()
          val out = nextOut; nextOut = null
          if (out == null) throw new NoSuchElementException
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Planner strategy: AsOfJoin logical → AsOfJoinExec physical. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, strict, outer, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, outer, tol) :: Nil
    case _ => Nil
  }
}

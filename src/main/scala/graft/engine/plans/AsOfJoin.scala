package graft.engine.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator extension point (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions`): for every left row, attach the single
  * right row with an equal key and the greatest `(rightTime, rightTie)`
  * not exceeding the left row's time; left rows with no such match are
  * dropped (inner as-of).
  *
  * Why a physical operator instead of the composed form
  * (`join_asof`'s range join + `max_by` re-aggregate): the composition
  * materializes EVERY (left, right) pair with `rightTime <= leftTime`
  * before the aggregate collapses them — at 100 TB a left row matching
  * a year of right history pays the whole year per row. This operator
  * is the plan a time-series engine would pick: one hash shuffle per
  * side, one in-partition sort per side (both Spark-planned via
  * `requiredChildDistribution`/`requiredChildOrdering` — AQE, spill
  * and all), then a single streaming merge pass whose state is ONE
  * buffered right row per partition. No pair blow-up, no aggregate.
  *
  * SQL-null semantics are preserved: null keys never match (either
  * side's null-keyed rows are skipped, not treated as equal), and a
  * null time can neither match nor be matched.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    outer: Boolean = false) extends BinaryNode {
  // left-outer as-of keeps unmatched left rows with a null-padded right
  // side, so the right attributes must surface as nullable
  override def output: Seq[Attribute] = left.output ++
    (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame-level entry: as-of join `left` to `right` on
    * `leftKey = rightKey`, matching the greatest `(rightTime,
    * rightTie) <= leftTime` per left row. Columns are resolved against
    * the analyzed child plans up front, so the node enters the
    * analyzer already resolved. */
  def frames(left: org.apache.spark.sql.DataFrame,
             right: org.apache.spark.sql.DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             rightTie: String,
             outer: Boolean = false): org.apache.spark.sql.DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // self-join / shared-lineage safety: if any right attribute id also
    // appears on the left, re-alias the whole right side with fresh ids
    // HERE — the analyzer's DeduplicateRelations would renew the child's
    // ids without rewriting this node's key/time/tie expressions
    val rp =
      if (rp0.outputSet.exists(lp.outputSet.contains))
        Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type (${lt.dataType} vs ${rt.dataType})")
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
        lt, rt, attr(rp, rightTie), outer))
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    outer: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++
    (if (outer) right.output.map(_.withNullability(true)) else right.output)

  // co-partition both sides on the key (Spark inserts the exchanges,
  // with AQE coalescing/skew handling as for any sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // in-partition order: (key, time) left; (key, time, tie) right — the
  // right ordering makes "last row consumed" = "greatest (time, tie)"
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(leftKeys, lOut)
      val rKey = UnsafeProjection.create(rightKeys, rOut)
      val lTime = BindReferences.bindReference(leftTime, lOut)
      val rTime = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      val joined = new JoinedRow
      // bind against nullable right attrs in outer mode, or the bound
      // references elide null checks and read 0s from the null padding
      val result = UnsafeProjection.create(output,
        lOut ++ (if (outer) rOut.map(_.withNullability(true)) else rOut))
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // single-row merge state: the lookahead right row and the best
        // (latest) candidate seen for the current key run
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var cand: InternalRow = null
        private var candKey: UnsafeRow = null
        private var pending: InternalRow = null

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKey(l)
            val lt = lTime.eval(l)
            if (!lk.anyNull && lt != null) {
              var advancing = true
              while (advancing && rHead != null) {
                val rk = rKey(rHead)
                if (rk.anyNull) advanceRight() // null keys never match
                else {
                  val cmp = keyOrd.compare(rk, lk)
                  if (cmp < 0) advanceRight() // stale key: discard
                  else if (cmp > 0) advancing = false
                  else {
                    val rt = rTime.eval(rHead)
                    if (rt == null) advanceRight() // NULLS FIRST in the
                    // sort, never a candidate: skip, don't stall the run
                    else if (timeOrd.lteq(rt, lt)) {
                      // in-window row for this key: rows are (time, tie)-
                      // ascending, so the last one kept is the match
                      cand = rHead.copy()
                      candKey = lk.copy()
                      advanceRight()
                    } else advancing = false
                  }
                }
              }
              if (cand != null && keyOrd.compare(candKey, lk) == 0)
                return result(joined(l, cand))
              else if (outer) return result(joined(l, nullRight))
            } else if (outer) {
              // null-key / null-time left rows can't match, but a
              // left-outer as-of still keeps them
              return result(joined(l, nullRight))
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending == null) pending = computeNext()
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }
  }
}

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
    outer: Boolean = false,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {
  require(leftKeys.length == rightKeys.length,
    s"as-of key arity mismatch (${leftKeys.length} vs ${rightKeys.length})")
  // mismatched key types would bypass analyzer coercion: HashPartitioning
  // hashes int 5 and long 5 differently (keys land in different
  // partitions) and the interpreted ordering, built from leftKeys types
  // only, would compare mismatched UnsafeRow layouts — silently wrong
  // output. Fail construction instead; callers cast first.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key columns must share a type (${l.dataType} vs ${r.dataType})")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type " +
      s"(${leftTime.dataType} vs ${rightTime.dataType})")
  require(AsOfJoin.Directions.contains(direction),
    s"as-of direction must be one of ${AsOfJoin.Directions.mkString("/")}")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
  // forward/nearest and tolerance need time DIFFERENCES, not just an
  // ordering, so the time column must be integral-backed (timestamps and
  // dates are long/int internally; tolerance is in those internal units —
  // MICROSECONDS for timestamps, DAYS for dates)
  if (direction != "backward" || tolerance.isDefined)
    require(AsOfJoin.integralBacked(leftTime.dataType),
      s"as-of direction=$direction/tolerance needs an integral-backed " +
        s"time column, got ${leftTime.dataType}")
  // left-outer as-of keeps unmatched left rows with a null-padded right
  // side, so the right attributes must surface as nullable
  override def output: Seq[Attribute] = left.output ++
    (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  val Directions: Set[String] = Set("backward", "forward", "nearest")

  /** Types whose internal (InternalRow) representation is an integral —
    * these support time differences, so tolerance/forward/nearest work.
    * Timestamps eval to Long micros, dates to Int days. */
  def integralBacked(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case LongType | IntegerType | ShortType | ByteType |
           DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** DataFrame-level entry: as-of join `left` to `right` on
    * `leftKey = rightKey`. Per left row, `direction` picks the match
    * among equal-key right rows: `"backward"` (default) the greatest
    * `(rightTime, rightTie) <= leftTime`; `"forward"` the least
    * `(rightTime, rightTie) >= leftTime`; `"nearest"` whichever of the
    * two is closer in time (ties prefer backward). `tolerance` (in the
    * time column's internal units — micros for timestamps, days for
    * dates) drops matches farther than that from the left time.
    * Columns are resolved against the analyzed child plans up front,
    * so the node enters the analyzer already resolved. */
  def frames(left: org.apache.spark.sql.DataFrame,
             right: org.apache.spark.sql.DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             rightTie: String,
             outer: Boolean = false,
             direction: String = "backward",
             tolerance: Option[Long] = None): org.apache.spark.sql.DataFrame =
    framesMulti(left, right, Seq(leftKey -> rightKey), leftTime, rightTime,
      rightTie, outer, direction, tolerance)

  /** Composite-key variant of [[frames]]: `keys` pairs each left key
    * column with its right counterpart; the hash co-partitioning and
    * the merge's key ordering span all of them. */
  def framesMulti(left: org.apache.spark.sql.DataFrame,
                  right: org.apache.spark.sql.DataFrame,
                  keys: Seq[(String, String)],
                  leftTime: String, rightTime: String,
                  rightTie: String,
                  outer: Boolean = false,
                  direction: String = "backward",
                  tolerance: Option[Long] = None): org.apache.spark.sql.DataFrame = {
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
    // resolve the way the session's analyzer would (case-insensitive
    // unless spark.sql.caseSensitive) instead of a bare name == compare
    val resolver = left.sparkSession.sessionState.analyzer.resolver
    def attr(p: LogicalPlan, n: String): Attribute = {
      val hits = p.output.filter(a => resolver(a.name, n))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(",")}")
      if (hits.length > 1) throw new IllegalArgumentException(
        s"column $n is ambiguous in ${p.output.map(_.name).mkString(",")}")
      hits.head
    }
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp,
        keys.map { case (lk, _) => attr(lp, lk) },
        keys.map { case (_, rk) => attr(rp, rk) },
        attr(lp, leftTime), attr(rp, rightTime), attr(rp, rightTie),
        outer, direction, tolerance))
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsOfJoin =>
      AsOfJoinExec(planLater(a.left), planLater(a.right),
        a.leftKeys, a.rightKeys, a.leftTime, a.rightTime, a.rightTie,
        a.outer, a.direction, a.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    outer: Boolean = false,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++
    (if (outer) right.output.map(_.withNullability(true)) else right.output)

  // co-partition both sides on the key. Spark inserts the exchanges and
  // AQE still plans/coalesces them, but NOT skew splitting:
  // OptimizeSkewedJoin only rewrites SortMergeJoinExec/
  // ShuffledHashJoinExec, so a hot key here is a single-task cliff —
  // salt the key upstream for skewed inputs (see join_asof_salted)
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
      // backward/nearest CONSUME equal-time rows into the candidate;
      // forward must stop AT the first row >= leftTime (it is the match)
      val consumeEqual = direction != "forward"
      // node construction guarantees integral-backed time whenever a
      // difference is needed (forward/nearest/tolerance)
      def tl(v: Any): Long = v match {
        case l: java.lang.Long    => l.longValue
        case i: java.lang.Integer => i.longValue
        case s: java.lang.Short   => s.longValue
        case b: java.lang.Byte    => b.longValue
        case other => throw new IllegalStateException(
          s"non-integral as-of time value: $other")
      }
      def tolOk(dist: => Long): Boolean = tolerance.forall(dist <= _)

      new Iterator[InternalRow] {
        // single-row merge state: the lookahead right row and the best
        // (latest <= leftTime) candidate seen for the current key run
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var cand: InternalRow = null
        private var candKey: UnsafeRow = null
        private var candTime: Any = null
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
                    else if (if (consumeEqual) timeOrd.lteq(rt, lt)
                             else timeOrd.lt(rt, lt)) {
                      // behind-window row for this key: rows are (time,
                      // tie)-ascending, so the last one kept is the
                      // backward match. Forward mode only discards —
                      // later left rows have later times, so a row
                      // behind THIS left time is behind all of them.
                      if (consumeEqual) {
                        cand = rHead.copy()
                        candKey = lk.copy()
                        candTime = rt
                      }
                      advanceRight()
                    } else advancing = false
                  }
                }
              }
              // backward candidate: last consumed row of this key run
              val backOk = cand != null && keyOrd.compare(candKey, lk) == 0 &&
                tolOk(tl(lt) - tl(candTime))
              // forward candidate: rHead, iff it stopped the advance on
              // this key (then its time is the least one >= / > leftTime)
              lazy val fwdTime: Any =
                if (rHead != null && {
                  val rk = rKey(rHead)
                  !rk.anyNull && keyOrd.compare(rk, lk) == 0
                }) rTime.eval(rHead) else null
              val matched: InternalRow = direction match {
                case "backward" => if (backOk) cand else null
                case "forward" =>
                  if (fwdTime != null && tolOk(tl(fwdTime) - tl(lt))) rHead
                  else null
                case "nearest" =>
                  // equal-time rows were consumed into cand, so any
                  // forward head is STRICTLY later: ties prefer backward
                  val fwdOk = fwdTime != null && tolOk(tl(fwdTime) - tl(lt))
                  if (backOk && fwdOk)
                    if (tl(lt) - tl(candTime) <= tl(fwdTime) - tl(lt)) cand
                    else rHead
                  else if (backOk) cand
                  else if (fwdOk) rHead
                  else null
              }
              if (matched != null) return result(joined(l, matched))
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

package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Execution-metric audit: run a plan and report what it actually
  * shuffled — the quantitative half of the plan-shape guards in
  * PlanSpec. Plan shapes prove an operator *would* scale; these
  * numbers prove the map-side combines / narrow projections really
  * held at runtime (shuffle records ≪ input rows), which is the
  * difference between "no cartesian product" and "this aggregate
  * moved 128 rows for a 6 000-row input".
  *
  * Used by MetricsSpec to pin numeric scaling properties (map-only
  * pipelines shuffle zero records; partial aggregates shuffle
  * O(groups × partitions); MinHash shuffles signatures, not text).
  */
object Metrics {
  final case class ShuffleStats(
      exchanges: Int, recordsWritten: Long, bytesWritten: Long)

  /** Execute `df` fully and sum shuffle-write metrics across every
    * exchange in the final (AQE-resolved) plan. Reused exchanges are
    * counted once — their write happened once. */
  def shuffleStats(df: DataFrame): ShuffleStats = {
    df.queryExecution.toRdd.count() // executes THIS QueryExecution's plan
    statsOfExecuted(df)
  }

  /** Read the shuffle-write metrics of a frame whose QueryExecution
    * has ALREADY run (e.g. the last timed pass of a bench query) —
    * walk-only, no jobs. Scope caveat: exchanges below a
    * [[graft.engine.ops.Checkpoints.cut]] materialized at query
    * construction are not in this plan tree and are not counted —
    * the numbers cover the timed final plan. */
  def statsOfExecuted(df: DataFrame): ShuffleStats = {
    var exchanges = 0
    var records = 0L
    var bytes = 0L
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case _: ReusedExchangeExec => // written once; counted at the original
      case other =>
        if (other.metrics.contains("shuffleRecordsWritten")) {
          exchanges += 1
          records += other.metrics("shuffleRecordsWritten").value
          bytes += other.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
        }
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    ShuffleStats(exchanges, records, bytes)
  }
}

package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

import graft.engine.ops.Checkpoints

/** ONE construction of every declared query's plans, shared by every
  * plan-predicate sweep (window gate, loop-join gate, codegen-parity
  * scope detector, rank-pushdown pins): the suite previously built all
  * 248 query plans once PER sweep (~4 full constructions). Each sweep
  * now evaluates its predicate on this shared instance.
  *
  * Built under `spark.graft.noCut=true`, which closes the gates'
  * declared blind spot (VERDICT r12): a `Checkpoints.cut`
  * materializes its subtree at query construction, so anything below
  * it reached later plan inspection as an opaque LogicalRDD — a
  * global window or unbounded loop join UNDER a cut was invisible to
  * every gate, an invariant carried only by review. With cuts
  * disabled the full logical tree survives into both the optimized
  * and the physical plan, so the gates walk what really executes —
  * including the cut subtrees — and construction runs no checkpoint
  * jobs. WindowGateSpec's cut-canary proves the mode makes a
  * previously-invisible offender visible.
  */
object SharedPlans {
  val sf = "/root/testdata/sf0.001"

  /** name -> (optimized logical plan, physical plan), fully forced
    * inside the lazy initializer so the noCut conf is live for every
    * plan computation and concurrent suites see only finished plans. */
  lazy val plans: Map[String, (LogicalPlan, SparkPlan)] =
    SparkTest.confLock.synchronized {
      val spark = SparkTest.session
      spark.conf.set(Checkpoints.NoCutKey, "true")
      try SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
        val qe = fn(spark, sf).queryExecution
        n -> (qe.optimizedPlan, qe.executedPlan)
      }.toMap
      finally spark.conf.unset(Checkpoints.NoCutKey)
    }

  def optimized(name: String): LogicalPlan = plans(name)._1
  def executed(name: String): SparkPlan = plans(name)._2
}

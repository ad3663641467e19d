package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `private[sql]` bridge this library uses — two entry points,
  * both faithful transcripts of what Spark's own public APIs do
  * internally. [[ofRows]] turns a custom [[LogicalPlan]] (e.g.
  * [[graft.engine.plans.AsOfJoin]]) into a DataFrame — `Dataset.ofRows`
  * is how every Spark relational API constructs frames; extensions
  * that introduce new logical operators (Delta, Hudi, Sedona, …) use
  * exactly this package-placement pattern because
  * `SparkSessionExtensions` has injection points for rules and
  * strategies but not for plan construction. [[checkpointCounted]] is
  * `Dataset.checkpoint(eager = true)` with the internal forcing
  * count() returned instead of discarded. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Eager checkpoint that SURFACES the materialization count. This is
    * a faithful transcript of `Dataset.checkpoint(eager = true)`
    * (Dataset.scala: `toRdd.map(_.copy())` → `rdd.{local,}checkpoint()`
    * → `rdd.count()` → wrap via `LogicalRDD.fromDataset`), except the
    * `count()` Spark's implementation runs purely to force
    * materialization — and then discards — is returned to the caller.
    * Iterative operators that need a per-round convergence count
    * (k-core peeling, triangle-gate sizing) otherwise pay a SECOND
    * action that re-reads the entire just-checkpointed dataset: free at
    * a glance on local[32] cached blocks, a full O(|E|) storage scan
    * per round on a reliable-checkpoint 100 TB run. */
  def checkpointCounted(df: DataFrame, reliable: Boolean): (DataFrame, Long) = {
    val ds = df.asInstanceOf[Dataset[_]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    val n = rdd.count()
    val logical = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (Dataset.ofRows(ds.sparkSession, logical), n)
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` bridge this library uses: turn a custom
  * [[LogicalPlan]] (e.g. [[graft.engine.plans.AsOfJoin]]) into a
  * DataFrame. `Dataset.ofRows` is how every Spark relational API
  * constructs frames; extensions that introduce new logical operators
  * (Delta, Hudi, Sedona, …) use exactly this package-placement pattern
  * because `SparkSessionExtensions` has injection points for rules and
  * strategies but not for plan construction. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

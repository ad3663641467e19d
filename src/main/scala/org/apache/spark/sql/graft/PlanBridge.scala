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
  /** Spark lines this bridge's `private[sql]` contract was validated
    * against (the full oracle suite ran on them). `Dataset.ofRows` /
    * `LogicalRDD.fromDataset` are internal API — a jar bump can move
    * them without any deprecation cycle, and the failure mode would be
    * a `NoSuchMethodError` deep inside query planning with no hint
    * that the bridge is the cause. */
  private[graft] val TestedSparkLines = Seq("4.1.")

  /** None when the running Spark is accepted; Some(named error)
    * otherwise. Outside the tested lines, a reflective probe of the
    * exact internal surface this file links against
    * ([[contractProbeOk]]) gets one chance to vouch for the new
    * version — same shape, proceed; moved API, fail loudly HERE with
    * the re-validation instruction instead of mid-plan. Parameterized
    * (version, probe result) so PlanBridgeContractSpec can pin the
    * rejection without faking a jar swap. */
  private[graft] def contractViolation(
      version: String, probeOk: Boolean): Option[String] =
    if (TestedSparkLines.exists(version.startsWith)) None
    else if (probeOk) None
    else Some(
      s"PlanBridge: Spark $version is outside the tested lines " +
        s"(${TestedSparkLines.mkString(", ")}) and the internal " +
        "Dataset.ofRows / LogicalRDD.fromDataset surface this bridge " +
        "links against could not be verified on it; re-validate " +
        "PlanBridge (and rerun the oracle suite) against this Spark " +
        "version before use")

  /** The runtime jars expose the two internal entry points this file
    * compiles against. Reflection, because with unmanaged jars the
    * compile-time and runtime classpaths can genuinely diverge — a
    * linkage break would otherwise surface as NoSuchMethodError at
    * first query. */
  private[graft] def contractProbeOk: Boolean = scala.util.Try {
    val ds = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val lr = Class.forName("org.apache.spark.sql.execution.LogicalRDD$")
    ds.getMethods.exists(_.getName == "ofRows") &&
      lr.getMethods.exists(_.getName == "fromDataset")
  }.getOrElse(false)

  // checked once, on the first bridge call of the JVM (every engine
  // query path crosses the bridge, so this IS a startup assertion)
  private lazy val ensureContract: Unit =
    contractViolation(org.apache.spark.SPARK_VERSION, contractProbeOk)
      .foreach(m => throw new IllegalStateException(m))

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    ensureContract
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
  }

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
    ensureContract
    val ds = df.asInstanceOf[Dataset[_]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    val n = rdd.count()
    val logical = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (Dataset.ofRows(ds.sparkSession, logical), n)
  }

  /** [[checkpointCounted]] that additionally counts rows whose BOOLEAN
    * column `flagCol` is true, computed BY the materialization pass —
    * iterative operators whose convergence test is "did any row
    * change?" (label-propagation components) otherwise re-read the
    * entire just-checkpointed frame every round, a full O(rows)
    * storage scan per round at reliable-checkpoint scale.
    *
    * The forcing action here is a per-partition flag count collected
    * to the driver (#partitions longs) instead of `count()` — it
    * computes every partition exactly like the count does, and the
    * flag total is the JOB'S RESULT, so it is exact by definition (an
    * accumulator in the materialization map double-fires: the
    * checkpoint's doCheckpoint pass re-executes partitions — measured
    * 2× on the spec frame). */
  def checkpointFlagCounted(df: DataFrame, reliable: Boolean,
      flagCol: String): (DataFrame, Long) = {
    ensureContract
    val ds = df.asInstanceOf[Dataset[_]]
    val idx = ds.schema.fieldIndex(flagCol)
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    val flagged = rdd.mapPartitions { it =>
      var c = 0L
      it.foreach(r => if (!r.isNullAt(idx) && r.getBoolean(idx)) c += 1)
      Iterator.single(c)
    }.collect().sum
    val logical = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    (Dataset.ofRows(ds.sparkSession, logical), flagged)
  }
}

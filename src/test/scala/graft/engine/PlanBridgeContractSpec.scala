package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

/** PlanBridge is the engine's one dependency on `private[sql]` Spark
  * internals (`Dataset.ofRows`, `LogicalRDD.fromDataset`). A Spark jar
  * bump that moves them would otherwise fail as a bare
  * NoSuchMethodError deep inside query planning; the bridge instead
  * asserts its contract on first use. This spec pins the gate's truth
  * table — including the rejection path, via the parameterized check
  * (simulating an incompatible version needs no jar swap) — and that
  * the live reflective probe passes on the JVM the suite runs on.
  */
class PlanBridgeContractSpec extends AnyFunSuite {

  test("the running Spark version is inside the tested lines") {
    assert(
      PlanBridge.TestedSparkLines
        .exists(org.apache.spark.SPARK_VERSION.startsWith),
      s"Spark ${org.apache.spark.SPARK_VERSION} not covered by " +
        s"${PlanBridge.TestedSparkLines} — re-validate PlanBridge and " +
        "extend TestedSparkLines")
  }

  test("the reflective contract probe passes on this classpath") {
    assert(PlanBridge.contractProbeOk,
      "Dataset.ofRows / LogicalRDD.fromDataset not found reflectively")
  }

  test("an incompatible-version simulation is rejected with a named " +
    "error; tested or probe-vouched versions pass") {
    // untested version AND failed probe → loud, named failure
    val err = PlanBridge.contractViolation("9.9.9", probeOk = false)
    assert(err.isDefined && err.get.contains("PlanBridge") &&
      err.get.contains("9.9.9"),
      s"expected a named rejection, got $err")
    // tested line → accepted regardless of probe
    assert(PlanBridge.contractViolation("4.1.2", probeOk = false).isEmpty)
    // untested line, but the internal surface still resolves → accepted
    assert(PlanBridge.contractViolation("9.9.9", probeOk = true).isEmpty)
  }
}

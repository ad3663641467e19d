package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSystem
import graft.engine.model.Status

/** End-to-end system lifecycle: submit → drain → active; restart
  * resumes nothing (terminal states skipped) — the reference's full
  * service loop (system.clj + initializer.clj) in one test. */
class GraftSystemSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("submit → runOnce → active; restart resumes nothing") {
    val root = Files.createTempDirectory("graft-sys").toString
    val sys = new GraftSystem(spark, root, "/root/testdata/sf0.001",
      Map("nation" -> Seq("n_nationkey"), "region" -> Seq("r_regionkey")))

    sys.submit("tpch.nation", "q_nation", "mq_nation")
    sys.submit("tpch.region", "q_region", "mq_region")
    sys.runOnce()

    // both seeded topics filled
    assert(sys.topics.readAll("q_nation").count() == 25)
    assert(sys.topics.readAll("q_region").count() == 5)
    // control state compacted to active for both
    val states = sys.controlState().collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(states.keySet == Set("tpch.nation", "tpch.region"))
    assert(states.values.forall(_.contains(s""""status":"${Status.Active}"""")))

    // a fresh system over the same root sees only terminal states → no work
    val sys2 = new GraftSystem(spark, root, "/root/testdata/sf0.001",
      Map("nation" -> Seq("n_nationkey"), "region" -> Seq("r_regionkey")))
    assert(sys2.start().isEmpty)
  }
}

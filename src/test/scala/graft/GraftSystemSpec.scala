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

  test("multi-partition data path: seeded topic spreads keys, per-key order holds") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-sys-p").toString
    val sfDir = "/root/testdata/sf0.001"
    val sys = new GraftSystem(spark, root, "cdc-control",
      (table: String) =>
        if (table == "tpch.nation")
          Some(graft.engine.cdc.SeedViews.forTable(
            spark.read.parquet(s"$sfDir/nation.parquet"), table, Seq("n_nationkey")))
        else None,
      topicPartitions = 8)
    sys.submit("tpch.nation", "q_nation", "mq_nation")
    sys.runOnce()
    val rows = sys.topics.readAll("q_nation").collect()
    assert(rows.length == 25)
    val partsUsed = rows.map(_.getAs[Int]("partition")).distinct
    assert(partsUsed.length > 1, "keys spread over multiple topic partitions")
    // per-partition offsets dense from 0; a key lives in one partition
    rows.groupBy(_.getAs[Int]("partition")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("offset")).sorted.toSeq ==
        (0L until rs.length).toSeq)
    }
    // compacted read still sees every key exactly once
    assert(sys.topics.readCompacted("q_nation")
      .select(col("key")).distinct().count() == 25)
  }
}

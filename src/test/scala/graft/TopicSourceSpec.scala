package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.engine.sources.TopicSource
import graft.engine.topics.FileTopicStore

/** DataSource V2 topic connector: result parity with the JSON reader,
  * per-file scan parallelism, offset/partition predicate pushdown, and
  * column pruning — all visible in the physical plan. */
class TopicSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private val fmt = classOf[TopicSource].getName

  private def seeded(): (FileTopicStore, String) = {
    val root = Files.createTempDirectory("graft-v2").toString
    val store = new FileTopicStore(spark, root, sleeper = _ => (), numPartitions = 4)
    store.create("t")
    store.append("t", (1 to 40).map(i => (s"k$i", s"v$i")).toDF("key", "value"))
    store.append("t", Seq(("k1", "v1b"), (null: String, "bare")).toDF("key", "value"))
    (store, Paths.get(root, "t").toString)
  }

  test("V2 read equals the JSON-reader read, row for row") {
    val (store, dir) = seeded()
    val v2 = spark.read.format(fmt).load(dir)
    assert(v2.schema == FileTopicStore.schema)
    val a = v2.collect().map(_.toString).sorted.toSeq
    val b = store.readAll("t")
      .select($"key", $"value", $"partition", $"offset", $"ts")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(v2.rdd.getNumPartitions >= 2, "one input partition per log file")
  }

  test("offset/partition predicates push into the scan; residuals stay above") {
    val (store, dir) = seeded()
    val df = spark.read.format(fmt).load(dir)
      .filter($"offset" >= 1 && $"partition" === 2 && $"value".startsWith("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[GreaterThanOrEqual(offset,1)"), plan)
    assert(plan.contains("EqualTo(partition,2)"), plan)
    val expected = store.readAll("t")
      .filter($"offset" >= 1 && $"partition" === 2 && $"value".startsWith("v"))
      .count()
    assert(df.count() == expected && expected > 0)
  }

  test("column pruning reaches the reader") {
    val (store, dir) = seeded()
    val df = spark.read.format(fmt).load(dir).select($"key")
    assert(df.queryExecution.executedPlan.toString.contains("columns=[key]"))
    assert(df.collect().map(_.getString(0)).count(_ != null) == 41)
    assert(store.readAll("t").count() == 42) // incl. the null-key row
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational12

/** The Relational12 batch: Q4/Q12 shapes, bottom-k sampling, degree
  * profiling. Plan-shape pins + first-principles recompute (value
  * equality vs DuckDB is the driver's oracle gate). */
class Relational12Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.01"

  test("join_tpch_q4 plans EXISTS as a left-semi join") {
    val df = Relational12.joinTpchQ4(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$p")
    // one output row per qualifying ORDER, however many late lines: the
    // total must not exceed the quarter's order count
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1997-01-01"
        && col("o_orderdate") < "1997-04-01").count()
    assert(df.agg(sum("order_count")).first.getLong(0) <= orders)
  }

  test("join_tpch_q12 buckets partition the joined year exactly") {
    val rows = Relational12.joinTpchQ12(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= "1997-01-01"
        && col("l_shipdate") < "1998-01-01")
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total == expect, "every joined line lands in exactly one bucket")
    assert(rows.map(_.getString(0)).toSeq ==
      rows.map(_.getString(0)).sorted.toSeq)
  }

  test("sample_bottomk: exact size, deterministic, TakeOrdered plan") {
    val df = Relational12.sampleBottomk(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"),
      s"bottom-k must plan as TakeOrdered, not a global sort:\n$p")
    val a = df.collect().map(_.getLong(0)).toSeq
    val b = Relational12.sampleBottomk(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(a.length == Relational12.BottomK && a == b,
      "same seed must reproduce the identical sample")
  }

  test("graph_degree_dist: bucket bounds nest and node counts total") {
    val rows = Relational12.graphDegreeDist(spark, sf).collect()
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn <= mx)
      assert((1L << b) <= mn && mx < (1L << (b + 1)),
        s"degrees in bucket $b must lie in [2^$b, 2^${b + 1}): $r")
    }
    val totalNodes = Tables.lineitem(spark, sf)
      .select("l_suppkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalNodes)
  }
}

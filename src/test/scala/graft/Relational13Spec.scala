package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational13

/** The Relational13 batch: Q13/Q19/Q22 shapes. */
class Relational13Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.01"

  test("join_tpch_q13: every customer lands in exactly one bucket") {
    val rows = Relational13.joinTpchQ13(spark, sf).collect()
    val customers = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == customers,
      "custdist must total the customer count (zero bucket preserved)")
    // the ON-clause filter must not delete customers: a WHERE-spelled
    // twin loses everyone whose every order is 5-LOW
    val whereSpelled = Tables.customer(spark, sf).select(col("c_custkey"))
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "inner")
      .select("c_custkey").distinct().count()
    assert(whereSpelled <= customers)
  }

  test("join_tpch_q19 plans a broadcast join and matches a set recompute") {
    val df = Relational13.joinTpchQ19(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"part side must broadcast:\n$p")
    val n = df.first.getLong(1)
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .count()
    assert(n == expect, "pre-join pruning must not change the matched set")
  }

  test("join_tpch_q22: anti join planned; multiply-through equals BigDecimal avg") {
    val df = Relational13.joinTpchQ22(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as anti join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0),
      "the no-urgent-order segment must be non-vacuous in the testdata")
    // driver-side reference with exact BigDecimal arithmetic
    val bals = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal").cast("decimal(18,2)"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
    val pos = bals.map(_._2).filter(_ > 0)
    val (sumPos, nPos) = (pos.sum, pos.length)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expect = bals
      .filter { case (k, b) => Set(1L, 3L, 5L).contains(k % 7) }
      .filter { case (k, b) => b * nPos > sumPos && !urgent.contains(k) }
      .groupBy(_._1 % 7).view.mapValues(_.length).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1).toInt).toMap == expect)
  }
}

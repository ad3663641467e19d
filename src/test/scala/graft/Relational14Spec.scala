package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational14

/** The Relational14 batch: correlated-aggregate TPC-H shapes. */
class Relational14Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.01"

  test("join_tpch_q8: share numerator is bounded by the denominator") {
    val rows = Relational14.joinTpchQ8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10000,
        s"share must be a basis-point fraction: $r")
      assert(r.getDouble(2) <= r.getDouble(3))
    }
    assert(rows.exists(_.getLong(1) > 0),
      "the focal nation must actually supply the region in the testdata")
  }

  test("join_tpch_q15: winners carry exactly the maximum revenue") {
    val rows = Relational14.joinTpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "every returned supplier ties the max")
  }

  test("join_tpch_q17: multiply-through threshold equals the avg form") {
    // 5*qty*n < sum  <=>  qty < 0.2*avg: equate row counts on a
    // driver-side recompute with exact arithmetic
    val stats = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expect = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"))
      .collect().count { r =>
        val (n, sm) = stats(r.getLong(0))
        r.getDouble(1) * 5 * n < sm
      }
    val got = Relational14.joinTpchQ17(spark, sf)
      .agg(sum("n_rows")).first.getLong(0)
    assert(got == expect)
  }

  test("join_tpch_q21: sole-late-supplier condition holds for every winner") {
    val winners = Relational14.joinTpchQ21(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(winners.nonEmpty)
    // rebuild per-order late/all supplier sets and check the invariant
    // on a sample of orders that contributed to some winner
    val lines = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = lines.groupBy(_._1)
    val waiting = byOrder.collect {
      case (ok, ls)
          if ls.map(_._2).distinct.length > 1
            && ls.filter(_._3).map(_._2).distinct.length == 1 =>
        ls.filter(_._3).map(_._2).head
    }
    val expectCounts = waiting.groupBy(identity).view.mapValues(_.size).toMap
    val got = Relational14.joinTpchQ21(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    got.foreach { case (supp, cnt) =>
      assert(expectCounts.get(supp).contains(cnt),
        s"supplier $supp count $cnt vs ${expectCounts.get(supp)}")
    }
  }
}

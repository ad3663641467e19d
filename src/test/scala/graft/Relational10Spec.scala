package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.engine.ops.Relational10

/** The Relational10 batch: classic warehouse shapes + data-management
  * primitives. Each test recomputes the expected answer from first
  * principles on sf0.001 and/or asserts the promised plan shape (the
  * oracle gate covers value equality at sf0.01; these pin the SCALE
  * claims the SURVEY rows make). */
class Relational10Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("join_tpch_q5 plans broadcast dims and no cartesian product") {
    val df = Relational10.joinTpchQ5(spark, sf)
    assert(df.count() > 0)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), "supplier/nation/region broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the cyclic nation condition must fold into the equi-join, not a loop join")
  }

  test("join_tpch_q5 revenue only counts local suppliers") {
    // recompute one nation's revenue from first principles
    val rows = Relational10.joinTpchQ5(spark, sf).collect()
    val viaSql = {
      spark.sql(s"""
        WITH l AS (SELECT * FROM parquet.`$sf/lineitem.parquet`),
         o AS (SELECT * FROM parquet.`$sf/orders.parquet`
               WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
         c AS (SELECT * FROM parquet.`$sf/customer.parquet`),
         s AS (SELECT * FROM parquet.`$sf/supplier.parquet`),
         n AS (SELECT * FROM parquet.`$sf/nation.parquet`),
         r AS (SELECT * FROM parquet.`$sf/region.parquet` WHERE r_name = 'ASIA')
        SELECT count(1) FROM l JOIN o ON l_orderkey = o_orderkey
          JOIN c ON o_custkey = c_custkey
          JOIN s ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN n ON s_nationkey = n_nationkey
          JOIN r ON n_regionkey = r_regionkey""").first.getLong(0)
    }
    assert(rows.map(_.getLong(2)).sum == viaSql,
      "row counts must match the reference join spelling")
  }

  test("join_tpch_q16 excludes complaint suppliers via anti join") {
    // sf0.01: the smallest SF whose supplier table has negative balances
    val sf = "/root/testdata/sf0.01"
    val df = Relational10.joinTpchQ16(spark, sf)
    val p = plan(df)
    assert(p.contains("LeftAnti"), "NOT IN must plan as an anti join")
    // no excluded supplier may be counted: rebuild the distinct sets
    val neg = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val counted = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") =!= "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    val expectTotal = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") =!= "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .filter(!col("l_suppkey").isin(neg.toSeq: _*))
      .select("p_brand", "p_type", "l_suppkey").distinct().count()
    assert(df.agg(sum("supplier_cnt")).first.getLong(0) == expectTotal)
    assert(counted.intersect(neg).nonEmpty,
      "testdata must actually exercise the exclusion for this test to bite")
  }

  test("ts_acf: lag-0 sanity via formula degeneration and bounded lags") {
    val rows = Relational10.tsAcf(spark, sf).collect()
    assert(rows.length > 0 && rows.forall(_.getLong(1) >= 1)
      && rows.forall(_.getLong(1) <= Relational10.AcfMaxLag.toLong))
    // |acf| <= 1 within integer flooring slack (floor can land at -10001
    // for a perfectly anti-correlated lag; anything beyond means the
    // multiply-through algebra is wrong)
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 10001),
      s"autocorrelation in basis points must stay in [-1,1]: ${rows.mkString(",")}")
  }

  test("ts_acf shuffles once on event_type (windows + aggregate share clustering)") {
    val p = plan(Relational10.tsAcf(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length +
      "Exchange rangepartitioning".r.findAllIn(p).length
    // one hash exchange for window+agg, one range for the presentation sort
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$p")
  }

  test("graph_labelprop matches a driver-side reference implementation") {
    val got = Relational10.graphLabelprop(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same synchronous min-majority rounds, in-memory
    val nodes = Tables.part(spark, sf).select("p_partkey")
      .collect().map(_.getLong(0)).sorted
    val und = nodes.filter(_ >= 10).flatMap(p => Seq(p -> p / 10, p / 10 -> p))
    val nbrs = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to Relational10.LpRounds) {
      lab = nodes.map { n =>
        nbrs.get(n) match {
          case None => n -> lab(n)
          case Some(ns) =>
            val counts = ns.groupBy(lab).map { case (l, xs) => (l, xs.length) }
            n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    assert(got == lab, "distributed LPA must equal the in-memory reference")
    assert(got.values.toSet.size < nodes.length,
      "three rounds must have merged some communities")
  }

  test("data_delete_vectors: popcount(bitmap) == n_del and rewrite threshold") {
    val rows = Relational10.dataDeleteVectors(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nDel) = (r.getLong(2), r.getLong(3))
      val pop = java.lang.Long.bitCount(r.getLong(4)) +
        java.lang.Long.bitCount(r.getLong(5))
      assert(pop == nDel, s"bitmap popcount must equal the deleted count: $r")
      assert(r.getBoolean(6) == (nDel * 10 >= nDocs))
    }
    assert(rows.exists(_.getLong(3) > 0), "delete predicate must fire somewhere")
  }

  test("data_skew_profile: shares are consistent and ordered") {
    val rows = Relational10.dataSkewProfile(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Relational10.SkewTopK)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "heavy hitters must be ordered by count desc")
    rows.foreach { r =>
      val (c, tot, k) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == c * 10000 / tot)
      assert(r.getLong(5) == c * k * 10000 / tot)
    }
  }

  test("text_hashtf: buckets bounded, counts total to token count") {
    val df = Relational10.textHashtf(spark, sf)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) >= 0
      && r.getLong(1) < Relational10.HashTfBuckets.toLong))
    val totalTf = rows.map(_.getLong(2)).sum
    val totalToks = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .select(size(graft.engine.ops.TextFeatures.tokens(col("text"))).as("n"))
      .agg(sum("n")).first.getLong(0)
    assert(totalTf == totalToks, "hashing must not lose or invent tokens")
  }
}

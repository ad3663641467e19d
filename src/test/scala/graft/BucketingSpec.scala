package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Bucketing, Tables}

/** Bucketed layout ⇒ shuffle-free co-located joins: both sides written
  * bucketed by the join key must join with zero Exchange operators in
  * the physical plan (the amortized-layout strategy for repeated
  * fact-table joins at scale). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  test("join of identically-bucketed tables plans no shuffle") {
    val sf = "/root/testdata/sf0.001"
    // disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf), "graft_orders_b", 4, Seq("o_custkey"))
      Bucketing.writeBucketed(
        Tables.customer(spark, sf), "graft_customer_b", 4, Seq("c_custkey"))
      val joined = Bucketing.bucketedJoin(spark,
        "graft_orders_b", "graft_customer_b", $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, plan:\n$plan")
      // and it is still correct
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    }
  }
}

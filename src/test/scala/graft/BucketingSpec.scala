package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Bucketing — the co-located-join story SURVEY §2 promises at 100 TB:
  * two tables bucketed (and sorted) on the join key join with ZERO
  * exchanges, because the bucketed scan's output partitioning already
  * satisfies the join's required distribution. At cluster scale this
  * is the difference between re-shuffling 100 TB per join and reading
  * co-located buckets. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("equi-join of co-bucketed tables plans no Exchange at all") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.engine.Bucketing.writeBucketed(
        Tables.orders(spark, sf),
        "b_orders", 8, Seq("o_custkey"), Some(s"$dir/b_orders"))
      graft.engine.Bucketing.writeBucketed(
        Tables.customer(spark, sf)
          .select(col("c_custkey"), col("c_mktsegment")),
        "b_customer", 8, Seq("c_custkey"), Some(s"$dir/b_customer"))

      val joined = graft.engine.Bucketing.bucketedJoin(spark,
        "b_orders", "b_customer", col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), "scan must use the bucket layout")

      // and it computes the same thing as the shuffled join
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

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
    SparkTest.confLock.synchronized {
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

  test("join_bucketed survives an orphaned warehouse dir from a dead JVM") {
    // The round-5 failure mode: the in-memory catalog dies with the JVM
    // but `spark-warehouse/graft_bkt_*` persists, so a fresh session's
    // saveAsTable hits "managed table location already exists". Simulate
    // the fresh JVM by planting orphan dirs at the exact table paths
    // with NO catalog entries, then run the query end to end.
    val sf = "/root/testdata/sf0.001"
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val names = Seq(s"graft_bkt_orders_$tag", s"graft_bkt_lineitem_$tag")
    val wh = new java.io.File(
      new java.net.URI(spark.sessionState.conf.warehousePath).getPath)
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val orphan = new java.io.File(wh, t.toLowerCase)
      orphan.mkdirs()
      Files.write(orphan.toPath.resolve("part-stale.parquet"),
        Array[Byte](1, 2, 3))
    }
    try {
      val got = graft.engine.ops.Relational8.joinBucketed(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val expected = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got.nonEmpty)
      got.foreach { case (prio, _, n) => assert(expected(prio) == n) }
      // and a second call in the SAME session reuses the tables (no rewrite)
      val again = graft.engine.ops.Relational8.joinBucketed(spark, sf).collect()
      assert(again.length == got.length)
    } finally {
      names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.ZipIndex

/** Contract of the engine's global-rank primitive ([[ZipIndex]]): the
  * rank must equal the single-partition ground truth for ANY partition
  * count and any duplicate structure, and the recovery must rely only
  * on `monotonically_increasing_id` being consecutive-ascending within
  * a partition — pinned here so a Spark upgrade that changed the id
  * layout fails THIS spec loudly instead of silently corrupting every
  * zipWithIndex consumer (cdc_progress, data_shuffle, agg_percentile,
  * the grouped quantiles).
  */
class ZipIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  /** Rows with heavy duplicate keys so range boundaries land inside
    * duplicate runs and partitions get uneven sizes. */
  private def frame(n: Int) =
    spark.range(n.toLong)
      .select(($"id" % 7).as("k"), ($"id" * 31 % n).as("u"))

  test("rank is exactly 0..n-1 and follows the sort order at every " +
    "partition count") {
    for (parts <- Seq(1, 3, 32)) {
      SparkTest.confLock.synchronized {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try {
          val (idxed, total) =
            ZipIndex.ranked(frame(1000), Seq($"k", $"u"), "idx")
          val rows = idxed.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          assert(total == 1000L)
          assert(rows.map(_._3).sorted.toSeq == (0L until 1000L),
            s"rank must be a 0-based permutation at $parts partitions")
          val bySortOrder = rows.sortBy(t => (t._1, t._2)).map(_._3).toSeq
          assert(bySortOrder == (0L until 1000L),
            s"rank must follow (k, u) order at $parts partitions")
        } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
    }
  }

  test("the multi-partition path is actually engaged (canary: ids are " +
    "NOT globally consecutive, so the shift map is doing real work)") {
    SparkTest.confLock.synchronized {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // AQE would coalesce the tiny range shuffle back to ONE partition
      // and make this canary vacuous (ids then ARE 0..n-1)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // pid and mid read from the SAME execution: a separate
        // getNumPartitions probe can see a different (re-planned)
        // partitioning than the collect
        val rows = frame(1000)
          .repartitionByRange($"k", $"u")
          .sortWithinPartitions($"k", $"u")
          .select(spark_partition_id().as("pid"),
            monotonically_increasing_id().as("mid"))
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(rows.map(_._1).distinct.length > 1,
          "engagement guard: the test frame must span partitions")
        assert(rows.map(_._2).sorted.toSeq != (0L until 1000L),
          "canary: raw ids must NOT already be the global rank — " +
            "otherwise this spec proves nothing about the recovery")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  test("empty input yields an empty frame and total 0") {
    val (idxed, total) =
      ZipIndex.ranked(frame(1000).filter($"k" < -1), Seq($"k"), "idx")
    assert(total == 0L)
    assert(idxed.count() == 0L)
  }

  test("a 1-row frame ranks 0") {
    val (idxed, total) = ZipIndex.ranked(frame(1), Seq($"k", $"u"), "idx")
    assert(total == 1L)
    assert(idxed.select($"idx").head().getLong(0) == 0L)
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout utilities: the storage-side half of the "co-locate
  * big joins" strategy (SURVEY §4). Writing both join sides bucketed
  * by the join key into the session catalog lets repeated joins run
  * shuffle-free — each bucket pair joins locally, which at 100 TB is
  * the difference between an every-query shuffle of the fact table and
  * a one-time layout cost amortized over the workload.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `keys` into the catalog.
    * Sorting within buckets additionally enables merge-join without a
    * per-query sort. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two identically-bucketed catalog tables on their bucket
    * keys. When bucket counts match, Catalyst proves co-partitioning
    * and plans the join with no Exchange on either side (asserted by
    * BucketingSpec). */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      cond: org.apache.spark.sql.Column): DataFrame =
    spark.table(left).join(spark.table(right), cond)

  /** Persist `df` hive-style directory-partitioned by `cols`
    * (`path/col=value/...`). The read-side payoff is PARTITION
    * PRUNING: a filter on the partition column never lists or opens
    * non-matching directories — at 100 TB, `WHERE lang = 'en'` scans
    * the `lang=en` files and nothing else (asserted by BucketingSpec
    * via `PartitionFilters` + the scanned-file list). Partition by
    * low-cardinality routing columns only; high-cardinality keys
    * belong in buckets (small-files problem). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Read a partition-pruned slice: equality filters on partition
    * columns, pushed to the file index. */
  def readPruned(
      spark: SparkSession,
      path: String,
      eq: Map[String, String]): DataFrame =
    eq.foldLeft(spark.read.parquet(path)) { case (df, (c, v)) =>
      df.filter(df(c) === v)
    }
}

package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed zipWithIndex — the engine's global-rank primitive
  * (cdc_progress, data_shuffle, agg_percentile; the grouped extension
  * lives in [[Relational6.aggQuantiles]]).
  *
  * A global rank is the textbook single-task plan (`Window.orderBy`
  * with no partition — the whole corpus through one task), and even
  * the partitioned-window spelling pays a SECOND full exchange (hash
  * by pid) just to rank rows the range shuffle already placed. Here
  * the data moves exactly ONCE: range-partition by the rank order,
  * sort within partitions, stamp `monotonically_increasing_id` ABOVE
  * the sort — the id is consecutive ascending within a partition by
  * its contract (partition id in the upper bits, a per-row counter in
  * the lower), which is all the recovery needs — and turn it into the
  * global 0-based rank as `mid − min(mid in pid) + rows-before-pid`
  * with a #partitions-sized driver map (O(1) map-literal lookup per
  * row; a when/otherwise chain would nest one level per partition,
  * past the JVM method-size limit codegen tolerates at cluster
  * partition counts). The checkpoint pins the (sampled, otherwise
  * per-job) range boundaries AND the stamped ids, so the offset scan
  * and the ranked scan see identical values; the rank is invariant to
  * where the boundaries land, which the partition-count invariance
  * sweep exercises surface-wide and ZipIndexSpec pins directly.
  */
object ZipIndex {
  /** Append 0-based global rank `idxCol` in `order`-sort order; also
    * returns the total row count (free from the offset scan). Ties in
    * `order` rank arbitrarily-but-deterministically within a
    * partition; pass a unique key suffix for a total order. The input
    * is materialized (checkpoint) — call once per frame. Column names
    * `_graft_pid`/`_graft_mid` are reserved scratch (shadowed inputs
    * would corrupt the rank). */
  def ranked(df: DataFrame, order: Seq[Column], idxCol: String)
      : (DataFrame, Long) = {
    val ranged = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_graft_pid", spark_partition_id())
      .withColumn("_graft_mid", monotonically_increasing_id())
      .transform(Checkpoints.cut)
    val sizes = ranged.groupBy(col("_graft_pid"))
      .agg(count(lit(1)).as("cnt"), min(col("_graft_mid")).as("mn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val total = sizes.map(_._2).sum
    val before = sizes.map(_._2).scanLeft(0L)(_ + _) // rows before pid
    val shift: Map[Int, Long] = sizes.zip(before)
      .map { case ((pid, _, mn), off) => pid -> (off - mn) }.toMap
    val out = ranged
      .withColumn(idxCol,
        col("_graft_mid") + element_at(typedLit(shift), col("_graft_pid")))
      .drop("_graft_pid", "_graft_mid")
    (out, total)
  }
}

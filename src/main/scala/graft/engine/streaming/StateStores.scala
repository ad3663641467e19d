package graft.engine.streaming

import org.apache.spark.sql.SparkSession

/** Engine-level state-store selection for the live streaming twins —
  * `spark.graft.stateStore` → Spark's provider conf.
  *
  * Why it exists: the default HDFS-backed provider keeps every key's
  * state IN EXECUTOR MEMORY (the "HDFS" part is only the checkpoint),
  * so unbounded-key streams — StreamingMinHash and StreamingDedup key
  * by document, StreamingSessionize by user — grow heap linearly with
  * distinct keys and OOM at corpus scale. RocksDB keeps working state
  * on local disk with a block-cache in native memory: the 100 TB
  * spilling path. Locally both providers pass the same twin specs
  * (RocksDbStateStoreSpec pins one end-to-end), so the knob is safe to
  * flip per deployment.
  *
  * Values: `rocksdb` → RocksDBStateStoreProvider; `hdfs` → the default
  * HDFSBackedStateStoreProvider (explicit reset); unset → leave the
  * session's current provider untouched. Anything else fails loudly at
  * configure time, not as a ClassNotFoundException at the first
  * micro-batch.
  *
  * transformWithState twins (FunnelState) are the exception to the
  * knob: Spark supports transformWithState ONLY on the RocksDB
  * provider, so those builders call [[configureForTws]], which pins
  * RocksDB and rejects an explicit conflicting `hdfs` with an error
  * naming the knob — the generic [[configure]] would silently honor
  * `hdfs` and the query would fail at start with Spark's opaque
  * provider check instead.
  *
  * Every stateful twin BUILDER calls [[configure]] itself (so a
  * caller-started query honors the knob with no extra step —
  * RocksDbStateStoreSpec asserts this), as does the engine's own
  * stream start (ControlStream). The provider conf is captured per
  * STREAMING QUERY at start, so this composes with any number of
  * concurrent queries but cannot re-point a running one.
  */
object StateStores {
  val Knob = "spark.graft.stateStore"
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Resolve the knob to a provider class, or None for "leave as-is".
    * Factored from [[configure]] so the mapping is testable without a
    * session mutation. */
  private[graft] def providerFor(knob: Option[String]): Option[String] =
    knob.map(_.trim.toLowerCase) match {
      case None => None
      case Some("rocksdb") => Some(RocksDbProvider)
      case Some("hdfs") | Some("default") => Some(HdfsProvider)
      case Some(other) => throw new IllegalArgumentException(
        s"$Knob=$other — expected rocksdb | hdfs | default")
    }

  def configure(spark: SparkSession): Unit =
    providerFor(spark.conf.getOption(Knob))
      .foreach(p => spark.conf.set(ProviderKey, p))

  /** Provider setup for transformWithState builders: ALWAYS RocksDB
    * (the only provider Spark accepts for that API). A knob explicitly
    * demanding the HDFS provider is a configuration conflict — fail
    * with the knob's name rather than let the query die at start on
    * Spark's generic provider assertion. */
  def configureForTws(spark: SparkSession): Unit = {
    providerFor(spark.conf.getOption(Knob)) match {
      case Some(HdfsProvider) => throw new IllegalArgumentException(
        s"$Knob=hdfs conflicts with a transformWithState operator — " +
          "Spark supports transformWithState only on " +
          "RocksDBStateStoreProvider; unset the knob or set rocksdb")
      case _ => ()
    }
    spark.conf.set(ProviderKey, RocksDbProvider)
  }
}

package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuning defaults.
  *
  * Local defaults mirror the test environment (local[32], 32 shuffle
  * partitions); the cluster-relevant settings are the ones that matter
  * at 100 TB and are safe locally:
  *
  *  - AQE on, with skew-join splitting (hot keys in as-of joins /
  *    band-key joins get split at runtime) and partition coalescing
  *    (small shuffles collapse instead of scheduling 32 tiny tasks);
  *  - 256 MB scan partitions (fewer, fuller tasks over parquet);
  *  - UTC session timezone (determinism contract, SURVEY §7.3e).
  *
  * On a real cluster, `spark.sql.shuffle.partitions` scales with
  * executor cores (2–3× total cores) — AQE coalescing makes
  * over-provisioning cheap — and broadcast thresholds ride on
  * accurate stats; nothing in the engine assumes a partition count.
  */
object GraftSession {
  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // the driver's events.parquet carries TIMESTAMP(NANOS): read nanos
      // as long session-wide (Tables.events truncates to µs). Declared
      // HERE, not buried in a loader: streaming reads re-derive parquet
      // schemas from the live conf every micro-batch, so the flag must
      // hold for the session's lifetime
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // reliable-mode hygiene (spark.graft.checkpointDir, see
      // ops.Checkpoints): iterative ops cut lineage every round, and
      // each round's checkpoint files would otherwise sit on the
      // shared store until the application exits — at 100 TB that is
      // rounds x frame-size of dead data. The context cleaner deletes
      // a checkpoint once its RDD is unreachable (the previous round's
      // frame, as soon as the next round replaces it). Must be set at
      // context creation, hence here and not in Checkpoints.cut.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.files.maxPartitionBytes", "268435456")
      // generated-class cache (static conf, default 100 entries): a
      // 244-query workload compiles far more than 100 distinct codegen
      // units per pass, so under the default every bench pass Janino-
      // recompiles from scratch — the round-8/9 per-query drifts
      // (tok_bpe_pairs, dedup_embed) were cache-thrash, not plan
      // regressions. 2,000 entries ≈ a few hundred MB of class
      // metadata, driver-side only, and makes steady-state timings
      // actually steady.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.functions.VectorOps.register(spark)
    spark
  }
}

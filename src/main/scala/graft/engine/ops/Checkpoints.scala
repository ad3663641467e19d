package graft.engine.ops

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative operators (PageRank, BFS, label
  * propagation, star contraction): each round's result must be
  * materialized or the plan tree — and failure recovery cost — grows
  * without bound.
  *
  * `localCheckpoint()` (the default) stores blocks on executors: fast,
  * zero configuration, but NOT fault-tolerant — losing one executor
  * mid-iteration kills the job, acceptable on local[32], not on a
  * 1000-executor 100 TB run. Setting `spark.graft.checkpointDir` to a
  * shared path (HDFS/S3) switches every iterative op to RELIABLE
  * `checkpoint()`: blocks land in replicated storage and survive
  * executor loss, at the cost of a write per round. One conf knob,
  * honest trade on both sides.
  */
object Checkpoints {
  /** Conf key selecting reliable checkpointing; unset → local. */
  val DirKey = "spark.graft.checkpointDir"

  /** Test-mode conf: when "true", [[cut]] is the IDENTITY — no
    * checkpoint, full lineage kept. A checkpoint materializes its
    * subtree at query construction, so everything below it appears to
    * later plan inspection as an opaque LogicalRDD; that made cut
    * subtrees a blind spot for the surface-wide plan gates (a global
    * window or unbounded loop join BELOW a cut was invisible to
    * WindowGateSpec). With this knob the gates walk the REAL full
    * plan. Never set it on a production run: the iterative operators
    * rely on cut() to bound lineage growth and recovery cost. */
  val NoCutKey = "spark.graft.noCut"

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.getOption(NoCutKey).contains("true")) return df
    reliableDir(df) match {
      case Some(_) => df.checkpoint()
      case None    => df.localCheckpoint()
    }
  }

  /** [[cut]] that also returns the row count OF THE MATERIALIZATION
    * JOB. An eager checkpoint already runs a `count()` internally to
    * force every partition; iterative operators whose convergence test
    * is "did the row count change?" (k-core peeling) or that gate a
    * broadcast on the materialized size (triangle counting) otherwise
    * pay a second action re-reading the whole just-checkpointed frame
    * — a full O(rows) storage scan per round under reliable
    * checkpointing at scale. Identical result frame to `cut(df)` plus
    * `df.count()`; one job instead of two (noCut test mode keeps the
    * two-job spelling — plans there are built for gate inspection, not
    * timing). */
  def cutCounted(df: DataFrame): (DataFrame, Long) = {
    val s = df.sparkSession
    if (s.conf.getOption(NoCutKey).contains("true")) return (df, df.count())
    org.apache.spark.sql.graft.PlanBridge
      .checkpointCounted(df, reliable = reliableDir(df).isDefined)
  }

  /** [[cut]] that also counts rows whose boolean `flagCol` is true,
    * computed BY the materialization pass (the flag total is the
    * forcing job's own result — exact, no second action re-reading the
    * checkpoint). noCut test mode keeps the two-job filter/count
    * spelling. */
  def cutFlagCounted(df: DataFrame, flagCol: String): (DataFrame, Long) = {
    val s = df.sparkSession
    if (s.conf.getOption(NoCutKey).contains("true"))
      return (df, df.filter(org.apache.spark.sql.functions.col(flagCol)).count())
    org.apache.spark.sql.graft.PlanBridge
      .checkpointFlagCounted(df, reliable = reliableDir(df).isDefined, flagCol)
  }

  /** Resolve the reliable-checkpoint dir (None → local checkpointing)
    * and make sure the SparkContext points at it. */
  private def reliableDir(df: DataFrame): Option[String] = {
    val s = df.sparkSession
    if (s.conf.getOption(NoCutKey).contains("true")) return None
    s.conf.getOption(DirKey).filter(_.nonEmpty).map { dir =>
      // setCheckpointDir appends a per-context UUID subdir, so the
      // context dir is "live" iff it sits under the CONFIGURED dir —
      // re-point when the conf changed (the knob is runtime conf and
      // must win over stale SparkContext state). getCheckpointDir
      // returns a fs-QUALIFIED path (scheme + authority), so qualify
      // the configured dir the same way before comparing: comparing
      // a raw `hdfs://nn/ckpt` conf against the qualified context
      // path with only one side stripped would never match, and
      // every cut() would mint a fresh UUID subdir.
      val cfg = qualify(s, dir.stripSuffix("/"))
      val live = s.sparkContext.getCheckpointDir.exists { c =>
        val cn = qualify(s, c)
        cn == cfg || cn.startsWith(cfg + "/")
      }
      if (!live) s.sparkContext.setCheckpointDir(dir.stripSuffix("/"))
      dir
    }
  }

  /** Fully-qualify `p` (scheme + authority + normalized path) through
    * the path's own FileSystem, exactly as SparkContext does when it
    * stores the checkpoint dir — so conf-vs-context comparisons see
    * the same canonical form whether the knob was set as `/ckpt`,
    * `file:/ckpt`, or `hdfs://nn/ckpt`. */
  private def qualify(s: org.apache.spark.sql.SparkSession, p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(s.sparkContext.hadoopConfiguration)
      .makeQualified(path).toString
  }
}

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

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir appends a per-context UUID subdir, so the
        // context dir is "live" iff it sits under the CONFIGURED dir —
        // re-point when the conf changed (the knob is runtime conf and
        // must win over stale SparkContext state). getCheckpointDir
        // returns a fs-qualified path; strip the scheme for the check.
        val cfg = dir.stripSuffix("/")
        val live = s.sparkContext.getCheckpointDir.exists { c =>
          val cn = c.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")
          cn == cfg || cn.startsWith(cfg + "/")
        }
        if (!live) s.sparkContext.setCheckpointDir(cfg)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}

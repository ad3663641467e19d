package graft

// Scratch dev probe (r20): list queries whose FINAL plan is a single
// range-sort directly over a map-only pipeline (Sort <- Exchange(range)
// <- project/filter <- scan, no other exchange/agg/join/window/generate)
// — those pay their whole projection TWICE (the RangePartitioner
// sampling pass). Candidates for the fn_try project-above-sort fix.
// Not part of the engine; delete freely.
object ProbeShape {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.engine.functions.VectorOps.register(spark)
    val ex = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    val range = "Exchange rangepartitioning".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        val nEx = ex.findAllIn(p).size
        val nRange = range.findAllIn(p).size
        val heavy = Seq("HashAggregate", "SortMergeJoin", "BroadcastHashJoin",
          "Window", "Generate", "ObjectHashAggregate", "SortAggregate",
          "MapPartitions", "BroadcastNestedLoopJoin", "Expand")
          .map(k => if (p.contains(k)) k.take(4) else "").filter(_.nonEmpty)
        if (nEx == 1 && nRange == 1)
          println(s"CAND $name heavy=[${heavy.mkString(",")}]")
      } catch { case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}") }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

// Dev tool: time selected SparkEntry queries at a scale factor, with
// warm passes, plus optional formatted plans — for iterating on a
// single operator without paying a full Bench run.
// Lives in the TEST tree so shipped LoC = engine LoC and no dev main
// rides the artifact (round-15 verdict item); run via:
//   sbt "Test/runMain TimeQ /root/testdata/sf0.1 dedup_embed,dedup_near [explain]"
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = graft.engine.GraftSession.get()
    graft.SparkEntry.entry(spark).count() // warm
    (1 to 3).foreach { pass =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        // full materialization, matching graft.Bench (count() prunes
        // the output projection and the presentation sort)
        graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        println(f"pass$pass $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
        // same inter-query cleanup as graft.Bench: without it the
        // queries' localCheckpoint blocks accumulate across the list
        // and later passes measure storage-pool eviction, not the plan
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
      }
    }
    if (args.length > 2 && args(2) == "explain")
      names.foreach { n =>
        println(s"=== $n ===")
        graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}

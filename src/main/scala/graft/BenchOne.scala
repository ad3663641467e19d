package graft

/** Single-query profiling harness: `runMain graft.BenchOne <name> [reps]`
  * times one `SparkEntry.queries` entry at SPARK_GRAFT_SF_DIR, printing
  * every rep (the first shows warm-up cost, the min is the steady state).
  * Exists so a per-query perf regression can be bisected without paying
  * for the full 240-query [[Bench]] sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.get()
    val fn = SparkEntry.queries(name)
    try SparkEntry.entry(spark).count()  // session warm-up, same as Bench
    catch { case scala.util.control.NonFatal(_) => () }
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      println(f"rep $i: $secs%.3f s ($n rows)")
      secs
    }
    println(f"min: ${times.min}%.3f s  mean: ${times.sum / reps}%.3f s")
    spark.stop()
  }
}

// Dev probe (r19 optimization round): which Catalyst phase costs the
// ~0.2s/query planning floor. Test tree only.
// (r20, per r19 ADVICE: moved out of the engine-ops package namespace —
// probes in this directory live in the plain `graft` package.)
package graft

object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.engine.GraftSession.get()

    val tail = Seq("scan_filter", "sort_multi", "subq_in", "set_union",
      "fn_string", "join_inner", "agg_having", "win_rank",
      "cdc_status_filter", "set_intersect", "subq_exists")
      .filter(graft.SparkEntry.queries.contains)

    (1 to 3).foreach { pass =>
      var tA = 0.0; var tO = 0.0; var tS = 0.0; var tR = 0.0; var tE = 0.0
      tail.foreach { n =>
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val qe = df.queryExecution
        val t0 = System.nanoTime()
        qe.assertAnalyzed()
        val t1 = System.nanoTime()
        qe.optimizedPlan
        val t2 = System.nanoTime()
        qe.executedPlan
        val t3 = System.nanoTime()
        val rdd = qe.toRdd
        val t4 = System.nanoTime()
        rdd.count()
        val t5 = System.nanoTime()
        tA += (t1 - t0) / 1e9; tO += (t2 - t1) / 1e9; tS += (t3 - t2) / 1e9
        tR += (t4 - t3) / 1e9; tE += (t5 - t4) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
      }
      println(f"PROBE phases pass$pass analyze=$tA%.2f optimize=$tO%.2f " +
        f"physical=$tS%.2f toRdd=$tR%.2f exec=$tE%.2f")
    }
    spark.stop()
  }
}

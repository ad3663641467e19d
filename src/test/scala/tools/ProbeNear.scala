package graft

// Scratch dev probe: stage-by-stage timing of dedup_near's pipeline.
// Not part of the engine; delete freely.
// Test tree on purpose (no dev main ships); run via sbt "Test/runMain graft.ProbeNear".
object ProbeNear {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"$label pass$p ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
      }
    }

    import spark.implicits._
    def base = graft.engine.ops.DedupOps.shingledDocs(spark, d)

    time("1_shingled")(base)
    time("2_explode_dfagg") {
      val ex = base.select($"doc_id", explode($"sh").as("g"))
      ex.groupBy($"g").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2 && $"df" <= 1000).select($"g")
    }
    time("3_kept") {
      val b = base
      val ex = b.select($"doc_id", explode($"sh").as("g"))
      val shared = ex.groupBy($"g").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2 && $"df" <= 1000).select($"g")
      ex.join(shared, Seq("g"))
    }
    time("4_full")(graft.SparkEntry.queries("dedup_near")(spark, d))
    spark.stop()
  }
}

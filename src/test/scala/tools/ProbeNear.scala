package graft

// Scratch dev probe (r20): interleaved same-JVM A/B of the dedup_near /
// dedup_containment candidate-build rewrite, plus result-equality check.
//   V0 = current (df hash-aggregate -> join shared back -> self-join ->
//        pair agg -> two base joins for na/nb)
//   V1 = window-df (count over partition by g: one explode pass, no
//        join-back) + na/nb carried as group keys (no base joins)
// Not part of the engine; delete freely.
// Run via sbt "Test/runMain graft.ProbeNear [sfDir]".
object ProbeNear {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)

    import spark.implicits._
    def base = graft.engine.ops.DedupOps.shingledDocs(spark, d)
    val maxDf = graft.engine.ops.DedupOps.NearMaxShingleDf

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    // --- V1 spellings -------------------------------------------------
    def nearV1: org.apache.spark.sql.DataFrame = {
      val b = base
      val ex = b.select($"doc_id", $"n", explode($"sh").as("g"))
      val kept = graft.engine.ops.Checkpoints.cut(
        ex.withColumn("df", count(lit(1)).over(Window.partitionBy($"g")))
          .filter($"df" >= 2 && $"df" <= maxDf)
          .select($"doc_id", $"n", $"g"))
      kept.as("x").join(kept.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
            least(col("x.n"), col("y.n")) * 2 >= greatest(col("x.n"), col("y.n")))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", round($"inter".cast("double") / ($"na" + $"nb" - $"inter"), 4))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    }

    def contV1: org.apache.spark.sql.DataFrame = {
      val b = base
      val ex = b.select($"doc_id", $"n", explode($"sh").as("g"))
      val kept = graft.engine.ops.Checkpoints.cut(
        ex.withColumn("df", count(lit(1)).over(Window.partitionBy($"g")))
          .filter($"df" >= 2 && $"df" <= maxDf)
          .select($"doc_id", $"n", $"g"))
      kept.as("x").join(kept.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("cont_e4", expr("(inter * 10000) DIV least(na, nb)"))
        .filter($"cont_e4" >= 8000)
        .select($"doc_a", $"doc_b", $"cont_e4")
        .orderBy($"doc_a", $"doc_b")
    }

    def nearV0 = graft.SparkEntry.queries("dedup_near")(spark, d)
    def contV0 = graft.SparkEntry.queries("dedup_containment")(spark, d)

    // --- equality check ----------------------------------------------
    def eq(a: => org.apache.spark.sql.DataFrame, b: => org.apache.spark.sql.DataFrame,
           label: String): Unit = {
      // construct each frame AFTER the other's collect + cleanup: cut()
      // materializes at construction, and clean() drops all checkpoint
      // blocks, so a pre-built second frame would lose its blocks
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
    }
    eq(nearV0, nearV1, "near")
    eq(contV0, contV1, "cont")

    // --- interleaved timing ------------------------------------------
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "near_V0" -> (() => nearV0), "near_V1" -> (() => nearV1),
      "cont_V0" -> (() => contV0), "cont_V1" -> (() => contV1))
    (1 to 4).foreach { pass =>
      variants.foreach { case (label, fn) =>
        val t0 = System.nanoTime()
        fn().queryExecution.toRdd.count()
        println(f"pass$pass $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        clean()
      }
    }
    spark.stop()
  }
}

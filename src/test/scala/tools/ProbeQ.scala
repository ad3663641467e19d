// Dev probe (r19 optimization round): same-JVM interleaved A/B of
// sim_knn_graph's symmetrization and the labelprop/landmarks edge
// builds. Test tree only.
package graft.engine.ops

object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import graft.engine.Tables

    def once(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      dt
    }

    val KnnGraphK = SimOps.KnnGraphK

    def knnWith(sym: DataFrame => DataFrame): DataFrame = {
      val bounded = DedupOps.ivfAssigned(spark, sfDir)
      val cosXY = round(expr("graft_dot(x.v, y.v)") / (col("x.nrm") * col("y.nrm")), 4)
      val pairs = bounded.as("x").join(bounded.as("y"),
          col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
          cosXY.as("cos"))
        .distinct()
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"vec_a").orderBy($"cos".desc, $"vec_b")
      sym(pairs).withColumn("nn_rank", row_number().over(w))
        .filter($"nn_rank" <= KnnGraphK)
        .select($"vec_a", $"vec_b", $"cos", $"nn_rank")
        .orderBy($"vec_a", $"nn_rank")
    }

    def unionSym(pairs: DataFrame): DataFrame = pairs.unionByName(
      pairs.select($"vec_b".as("vec_a"), $"vec_a".as("vec_b"), $"cos"))
    def explodeSym(pairs: DataFrame): DataFrame = pairs
      .select(explode(array(
        struct($"vec_a", $"vec_b", $"cos"),
        struct($"vec_b".as("vec_a"), $"vec_a".as("vec_b"), $"cos"))).as("e"))
      .select($"e.vec_a".as("vec_a"), $"e.vec_b".as("vec_b"), $"e.cos".as("cos"))

    val rows = (1 to 4).map { p =>
      val a = once(knnWith(unionSym))
      val b = once(knnWith(explodeSym))
      println(f"PROBE knn pass$p union=$a%.3f explode=$b%.3f")
      (a, b)
    }
    println(f"PROBE knn medians union=${rows.map(_._1).sorted.apply(2)}%.3f " +
      f"explode=${rows.map(_._2).sorted.apply(2)}%.3f")

    // labelprop edge build only (scan-dup vs explode)
    def lpEdges(ex: Boolean): DataFrame = {
      val nodes = Tables.part(spark, sfDir).select($"p_partkey".as("node"))
      val e0 = nodes.filter($"node" >= 10)
        .select($"node".as("a"), expr("node DIV 10").as("b"))
      if (ex) e0.select(explode(array(
          struct($"a", $"b"), struct($"b".as("a"), $"a".as("b")))).as("e"))
        .select($"e.a".as("a"), $"e.b".as("b"))
      else e0.unionAll(e0.select($"b".as("a"), $"a".as("b")))
    }
    val rows2 = (1 to 4).map { p =>
      val a = once(lpEdges(false))
      val b = once(lpEdges(true))
      println(f"PROBE lpedges pass$p union=$a%.3f explode=$b%.3f")
      (a, b)
    }
    println(f"PROBE lpedges medians union=${rows2.map(_._1).sorted.apply(2)}%.3f " +
      f"explode=${rows2.map(_._2).sorted.apply(2)}%.3f")
    spark.stop()
  }
}

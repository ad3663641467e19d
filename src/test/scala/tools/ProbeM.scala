package graft

// Scratch dev probe (r20): misc second-tier A/Bs.
//   join_multikey: V1 = min-over-window + filter (1 exchange) instead
//                  of groupBy-min + self-join (agg exchange + join)
//   graph_bfs:     V1 = drop the per-level `visited` cut (visited is a
//                  union of already-checkpointed frontiers — lineage
//                  stays bounded without re-materializing it per level)
//   agg_multi_distinct: V1 = join of per-column distinct aggregates
//                  instead of the expand-based multi-distinct
// Not part of the engine; delete freely.
// Run via sbt "Test/runMain graft.ProbeM [sfDir]".
object ProbeM {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import spark.implicits._
    import graft.engine.{Tables => T}
    import graft.engine.ops.Checkpoints

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    def multikeyV1: DataFrame = {
      val li = T.lineitem(spark, d)
      li.withColumn("fl",
          min($"l_linenumber").over(Window.partitionBy($"l_orderkey")))
        .filter($"l_linenumber" === $"fl")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    }

    def bfsV1: DataFrame = {
      val pk = T.part(spark, d).select($"p_partkey".as("p"))
        .filter($"p" >= 10)
      val edges = Checkpoints.cut(
        pk.select($"p".as("src"), expr("p DIV 10").as("dst"))
          .union(pk.select(expr("p DIV 10").as("src"), $"p".as("dst"))))
      var visited = spark.range(1)
        .select(lit(123L).as("node"), lit(0L).as("dist"))
      var frontier = visited.select($"node")
      for (i <- 1 to 6) {
        val next = Checkpoints.cut(edges
          .join(frontier.withColumnRenamed("node", "src"), "src")
          .select($"dst".as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(i.toLong)))
        visited = visited.union(next)
        frontier = next.select($"node")
      }
      visited.orderBy($"dist", $"node")
    }

    def multiDistinctV1: DataFrame = {
      val li = T.lineitem(spark, d)
      def dc(c: String, as: String) =
        li.select($"l_returnflag", col(c)).distinct()
          .groupBy($"l_returnflag").agg(count(lit(1)).as(as))
      dc("l_partkey", "n_parts")
        .join(dc("l_suppkey", "n_supps"), "l_returnflag")
        .join(dc("l_orderkey", "n_orders"), "l_returnflag")
        .join(li.groupBy($"l_returnflag").agg(count(lit(1)).as("n_rows")),
          "l_returnflag")
        .select($"l_returnflag", $"n_parts", $"n_supps", $"n_orders", $"n_rows")
        .orderBy($"l_returnflag")
    }

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    def eq(a: => DataFrame, b: => DataFrame, label: String): Unit = {
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
    }
    eq(v0("join_multikey"), multikeyV1, "multikey")
    eq(v0("graph_bfs"), bfsV1, "bfs")
    eq(v0("agg_multi_distinct"), multiDistinctV1, "multidistinct")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "mk_V0" -> (() => v0("join_multikey")), "mk_V1" -> (() => multikeyV1),
      "bfs_V0" -> (() => v0("graph_bfs")), "bfs_V1" -> (() => bfsV1),
      "md_V0" -> (() => v0("agg_multi_distinct")), "md_V1" -> (() => multiDistinctV1))
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

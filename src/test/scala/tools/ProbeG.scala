package graft

// Scratch dev probe (r20): interleaved same-JVM A/B for the graph family.
//   jacc: V0 = current graph_jaccard; V1 = window-df posting build +
//         degree attached pre-join, carried as group keys
//   kcore: V0 = current; V1 = two peel rounds per checkpoint (half the
//          materialization jobs; peel is idempotent at the fixpoint so
//          results are identical)
//   tri:  V0 = current; V1 = edge-build li cut (kcore-style)
// Not part of the engine; delete freely.
// Run via sbt "Test/runMain graft.ProbeG [sfDir]".
object ProbeG {
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

    // --- V1 graph_jaccard ----------------------------------------------
    def jaccV1: DataFrame = {
      val cap = graft.engine.ops.Relational7.JaccardMaxPartDf
      val edges = T.lineitem(spark, d)
        .select($"l_suppkey".as("sk"), $"l_partkey".as("p"))
        .distinct()
        .transform(Checkpoints.cut)
      val deg = edges.groupBy($"sk").agg(count(lit(1)).as("n"))
      val kept = Checkpoints.cut(
        edges.withColumn("df", count(lit(1)).over(Window.partitionBy($"p")))
          .filter($"df" >= 2 && $"df" <= cap)
          .select($"sk", $"p")
          .join(deg, "sk"))
      kept.as("a").join(kept.as("b"),
          col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("sa"), col("b.sk").as("sb"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jacc_bp", expr("(inter * 10000) DIV (na + nb - inter)"))
        .select($"sa", $"sb", $"inter", $"jacc_bp")
        .orderBy($"jacc_bp".desc, $"sa", $"sb")
        .limit(20)
    }

    // --- V1 graph_kcore --------------------------------------------------
    def kcoreV1: DataFrame = {
      val K = graft.engine.ops.Relational8.KCoreK
      val maxR = graft.engine.ops.Relational8.KCoreMaxRounds
      val li = Checkpoints.cut(T.lineitem(spark, d)
        .filter($"l_orderkey" % 4 === 0)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      var (e, n) = Checkpoints.cutCounted(li.as("a")
        .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .select($"a.pk".as("u"), $"b.pk".as("v")).distinct())
      def peel(ed: DataFrame): DataFrame = {
        val keep = ed.select($"u".as("n")).unionAll(ed.select($"v".as("n")))
          .groupBy($"n").agg(count(lit(1)).as("dg"))
          .filter($"dg" >= K).select($"n")
        ed.join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
      }
      var r = 0
      var done = false
      while (r < maxR && !done) {
        val (next, m) = Checkpoints.cutCounted(peel(peel(e)))
        done = m == n
        e = next; n = m; r += 2
      }
      e.select($"u".as("n")).unionAll(e.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
        .orderBy($"n")
    }

    // --- V1 graph_triangles ----------------------------------------------
    def triV1: DataFrame = {
      val li = Checkpoints.cut(T.lineitem(spark, d)
        .filter($"l_orderkey" % 4 === 0)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      val (edges, nEdges) = Checkpoints.cutCounted(li.as("a")
        .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .select($"a.pk".as("u"), $"b.pk".as("v"))
        .distinct())
      val maxBroadcastEdges = spark.conf.get(
        "spark.graft.triangles.broadcastMaxEdges", "10000000").toLong
      val deg0 = edges.select($"u".as("n")).unionAll(edges.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("dg"))
        .select($"n", struct($"dg", $"n").as("rank"))
      val deg = if (nEdges <= maxBroadcastEdges) broadcast(deg0) else deg0
      val oriented = Checkpoints.cut(edges
        .join(deg.withColumnRenamed("n", "u").withColumnRenamed("rank", "ru"), Seq("u"))
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("rank", "rv"), Seq("v"))
        .select(
          when($"ru" < $"rv", $"u").otherwise($"v").as("src"),
          when($"ru" < $"rv", $"v").otherwise($"u").as("dst"),
          greatest($"ru", $"rv").as("rdst")))
      val wedges = oriented.as("o1")
        .join(oriented.as("o2"),
          $"o1.src" === $"o2.src" && $"o1.rdst" < $"o2.rdst")
        .select($"o1.dst".as("b"), $"o2.dst".as("c"))
      val closing = oriented.select($"src".as("b"), $"dst".as("c"))
      val closingSide =
        if (nEdges <= maxBroadcastEdges) broadcast(closing) else closing
      wedges.join(closingSide, Seq("b", "c"))
        .agg(count(lit(1)).as("n_triangles"))
        .select(lit(nEdges).as("n_edges"), $"n_triangles")
    }

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    def eq(a: => DataFrame, b: => DataFrame, label: String): Unit = {
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
    }
    eq(v0("graph_jaccard"), jaccV1, "jacc")
    eq(v0("graph_kcore"), kcoreV1, "kcore")
    eq(v0("graph_triangles"), triV1, "tri")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "jacc_V0" -> (() => v0("graph_jaccard")), "jacc_V1" -> (() => jaccV1),
      "kcore_V0" -> (() => v0("graph_kcore")), "kcore_V1" -> (() => kcoreV1),
      "tri_V0" -> (() => v0("graph_triangles")), "tri_V1" -> (() => triV1))
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

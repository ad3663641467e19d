// Dev probe (r19 optimization round): compare candidate plan shapes for
// the heavy bench rows before committing a restructure. Test tree only.
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import spark.implicits._

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"PROBE $name%-40s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    import graft.engine.Tables
    import graft.engine.ops.Checkpoints
    val JaccardMaxPartDf = 5000

    def edgesCut() = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("sk"), $"l_partkey".as("p"))
      .distinct()
      .transform(Checkpoints.cut)

    // A: current shape
    def varA(): DataFrame = {
      val edges = edgesCut()
      val deg = edges.groupBy($"sk").agg(count(lit(1)).as("n"))
      val hot = edges.groupBy($"p").agg(count(lit(1)).as("df"))
        .filter($"df" > JaccardMaxPartDf).select($"p")
      val kept = edges.join(hot, Seq("p"), "left_anti")
      kept.as("a").join(kept.as("b"),
          col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("sa"), col("b.sk").as("sb"))
        .agg(count(lit(1)).as("inter"))
        .join(deg.select($"sk".as("sa"), $"n".as("na")), "sa")
        .join(deg.select($"sk".as("sb"), $"n".as("nb")), "sb")
        .withColumn("jacc_bp", expr("(inter * 10000) DIV (na + nb - inter)"))
        .select($"sa", $"sb", $"inter", $"jacc_bp")
        .orderBy($"jacc_bp".desc, $"sa", $"sb")
        .limit(20)
    }

    // B: cut(kept) so hot+anti compute once; rest same
    def varB(): DataFrame = {
      val edges = edgesCut()
      val deg = edges.groupBy($"sk").agg(count(lit(1)).as("n"))
      val hot = edges.groupBy($"p").agg(count(lit(1)).as("df"))
        .filter($"df" > JaccardMaxPartDf).select($"p")
      val kept = Checkpoints.cut(edges.join(hot, Seq("p"), "left_anti"))
      kept.as("a").join(kept.as("b"),
          col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("sa"), col("b.sk").as("sb"))
        .agg(count(lit(1)).as("inter"))
        .join(deg.select($"sk".as("sa"), $"n".as("na")), "sa")
        .join(deg.select($"sk".as("sb"), $"n".as("nb")), "sb")
        .withColumn("jacc_bp", expr("(inter * 10000) DIV (na + nb - inter)"))
        .select($"sa", $"sb", $"inter", $"jacc_bp")
        .orderBy($"jacc_bp".desc, $"sa", $"sb")
        .limit(20)
    }

    // C: posting-list pair generation (posexplode + slice + explode),
    // kept consumed once (no cut of kept needed)
    def varC(): DataFrame = {
      val edges = edgesCut()
      val deg = edges.groupBy($"sk").agg(count(lit(1)).as("n"))
      val hot = edges.groupBy($"p").agg(count(lit(1)).as("df"))
        .filter($"df" > JaccardMaxPartDf).select($"p")
      val kept = edges.join(hot, Seq("p"), "left_anti")
      val lists = kept.groupBy($"p")
        .agg(sort_array(collect_list($"sk")).as("sks"))
      val pairs = lists
        .select(posexplode($"sks").as(Seq("i", "sa")), $"sks")
        .select($"sa", explode(slice($"sks", $"i" + lit(2),
          size($"sks") - $"i" - lit(1))).as("sb"))
      pairs.groupBy($"sa", $"sb")
        .agg(count(lit(1)).as("inter"))
        .join(deg.select($"sk".as("sa"), $"n".as("na")), "sa")
        .join(deg.select($"sk".as("sb"), $"n".as("nb")), "sb")
        .withColumn("jacc_bp", expr("(inter * 10000) DIV (na + nb - inter)"))
        .select($"sa", $"sb", $"inter", $"jacc_bp")
        .orderBy($"jacc_bp".desc, $"sa", $"sb")
        .limit(20)
    }

    time("jaccard A current")(varA())
    time("jaccard B cutKept")(varB())
    time("jaccard C postingList")(varC())
    // result equality check: A vs C
    val a = varA().collect().map(_.toString).toSeq
    val c = varC().collect().map(_.toString).toSeq
    val b = varB().collect().map(_.toString).toSeq
    println(s"EQUAL A==C: ${a == c}  A==B: ${a == b}  (n=${a.size})")
    spark.stop()
  }
}

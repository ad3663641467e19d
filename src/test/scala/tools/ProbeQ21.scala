package graft

// Scratch dev probe (r20): join_tpch_q21 — replace the lone
// countDistinct (which forces a distinct pre-aggregate alongside the
// min/max aggregates) with `min(l_suppkey) =!= max(l_suppkey)` for the
// ">1 distinct suppliers" test (l_suppkey is non-null, so min != max
// iff at least two distinct values). Not part of the engine; delete
// freely. Run via sbt "Test/runMain graft.ProbeQ21 [sfDir]".
object ProbeQ21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import spark.implicits._
    import graft.engine.{Tables => T}

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    def q21V1: DataFrame =
      T.lineitem(spark, d)
        .join(T.orders(spark, d).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey",
          when($"l_shipdate" > expr("o_orderdate + INTERVAL 60 DAYS"),
            $"l_suppkey").as("late_supp"))
        .groupBy($"l_orderkey")
        .agg(min($"l_suppkey").as("slo"), max($"l_suppkey").as("shi"),
          min($"late_supp").as("lo"), max($"late_supp").as("hi"))
        .filter($"slo" =!= $"shi" && $"lo" === $"hi")
        .groupBy($"lo".as("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"l_suppkey")
        .limit(20)

    def v0 = graft.SparkEntry.queries("join_tpch_q21")(spark, d)

    val ra = v0.collect().map(_.toString).toSeq
    clean()
    val rb = q21V1.collect().map(_.toString).toSeq
    clean()
    println(s"EQ q21 rows=${ra.size}/${rb.size} equal=${ra == rb}")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q21_V0" -> (() => v0), "q21_V1" -> (() => q21V1))
    (1 to 4).foreach { pass =>
      variants.foreach { case (label, fn) =>
        val t0 = System.nanoTime()
        fn().queryExecution.toRdd.count()
        println(f"pass$pass $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        clean()
      }
    }
    println("=== q21_V1 plan ===")
    q21V1.explain("formatted")
    spark.stop()
  }
}

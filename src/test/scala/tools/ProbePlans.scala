package graft

// Scratch dev probe (r20): dump the PRE-r20 (r19) spellings' formatted
// plans for the three queries rewritten in ProbeM, so plans/r20 carries
// a before/after pair for each. Bodies copied verbatim from the r19
// code (git eca9450). Not part of the engine; delete freely.
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import spark.implicits._
    import graft.engine.{Tables => T}
    import graft.engine.ops.Checkpoints

    println("=== join_multikey ===")
    locally {
      val li = T.lineitem(spark, d)
      val firstLines = li.groupBy($"l_orderkey".as("o_key"))
        .agg(min($"l_linenumber").as("first_line"))
      li.join(firstLines,
          $"l_orderkey" === $"o_key" && $"l_linenumber" === $"first_line")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
        .explain("formatted")
    }

    println("=== agg_multi_distinct ===")
    T.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
      .explain("formatted")

    println("=== join_tpch_q21 ===")
    T.lineitem(spark, d)
      .join(T.orders(spark, d).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        when($"l_shipdate" > expr("o_orderdate + INTERVAL 60 DAYS"),
          $"l_suppkey").as("late_supp"))
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        min($"late_supp").as("lo"), max($"late_supp").as("hi"))
      .filter($"n_supp" > 1 && $"lo" === $"hi")
      .groupBy($"lo".as("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"l_suppkey")
      .limit(20)
      .explain("formatted")

    println("=== graph_bfs ===")
    locally {
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
        visited = Checkpoints.cut(visited.union(next))
        frontier = next.select($"node")
      }
      visited.orderBy($"dist", $"node").explain("formatted")
    }
    spark.stop()
  }
}

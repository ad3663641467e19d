package graft

// Scratch dev probe (r20): ts_acf decimal-sum (r19 spelling, inlined
// here) vs SplitSum (production) A/B + row equality. Also times the six
// small SplitSum conversions' queries after the change (join_left,
// agg_having, agg_pivot, agg_incremental, agg_unpivot, stream_tumbling).
// Not part of the engine; delete freely.
object ProbeAcf {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import spark.implicits._
    import graft.engine.{Tables => T}
    import graft.engine.ops.Relational10.AcfMaxLag

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    // r19 spelling (decimal accumulators), verbatim from git eca9450
    def acfV0: DataFrame = {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val w = Window.partitionBy($"event_type").orderBy($"ts_us", $"event_id")
      val ev = T.events(spark, d)
        .select($"event_id", $"event_type",
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("x"))
      val withLeads = (1 to AcfMaxLag).foldLeft(ev) { (df, k) =>
        df.withColumn(s"y$k", lead($"x", k).over(w))
      }
      val aggs =
        Seq(count(lit(1)).as("n"),
          sum($"x".cast(dec)).as("sx"),
          sum(($"x".cast(dec)) * $"x").as("q2")) ++
        (1 to AcfMaxLag).flatMap { k =>
          Seq(
            count(col(s"y$k")).as(s"m$k"),
            sum(($"x".cast(dec)) * col(s"y$k")).as(s"xy$k"),
            sum(when(col(s"y$k").isNotNull, $"x").otherwise(lit(0L)).cast(dec))
              .as(s"a$k"),
            sum(col(s"y$k").cast(dec)).as(s"b$k"))
        }
      val stats = withLeads.groupBy($"event_type").agg(aggs.head, aggs.tail: _*)
      // downstream of the aggregate is identical in both spellings —
      // rebuild the production tail over the V0 stats by name
      graft.engine.ops.Relational10.acfTail(stats)
    }

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    val ra = acfV0.collect().map(_.toString).toSeq
    clean()
    val rb = v0("ts_acf").collect().map(_.toString).toSeq
    clean()
    println(s"EQ ts_acf rows=${ra.size}/${rb.size} equal=${ra == rb}")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "acf_V0" -> (() => acfV0), "acf_V1" -> (() => v0("ts_acf")))
    (1 to 4).foreach { pass =>
      variants.foreach { case (label, fn) =>
        val t0 = System.nanoTime()
        fn().queryExecution.toRdd.count()
        println(f"pass$pass $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
        clean()
      }
    }
    // small conversions: after-only timing (sub-floor rows; the
    // mechanism is the r19-proven SplitSum, kept on plan evidence)
    Seq("join_left", "agg_having", "agg_pivot", "agg_incremental",
      "agg_unpivot", "stream_tumbling").foreach { n =>
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        v0(n).queryExecution.toRdd.count()
        println(f"pass$p $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
        clean()
      }
    }
    spark.stop()
  }
}

package graft

// Scratch dev probe (r20): window family A/B.
//   win_range: V1 = offsets computed as a tiny window-over-aggregate
//              broadcast join instead of the driver collect (one fewer
//              job in the timed path, no driver round-trip)
//   win_running / win_moving: V1 = LONG cents window accumulator +
//              exact decimal recombination at emit (no Decimal128 in
//              window state)
//   stage decomposition of win_range's pipeline.
// Not part of the engine; delete freely.
// Run via sbt "Test/runMain graft.ProbeW [sfDir]".
object ProbeW {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.DecimalType
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
    val dec = DecimalType(18, 2)
    val cents = lit(new java.math.BigDecimal("0.01"))

    // --- win_range V1: offsets via join --------------------------------
    def winRangeV1: DataFrame = {
      val ord = T.orders(spark, d)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
          ($"o_totalprice".cast(dec) * 100).cast("long").as("pc"))
      val g = ord
        .groupBy($"o_orderpriority".as("g_pri"), $"o_totalprice".as("g_price"))
        .agg(sum($"pc").as("gc"))
      val ranged = g.repartitionByRange($"g_pri", $"g_price")
        .withColumn("pid", spark_partition_id())
        .transform(Checkpoints.cut)
      val wOff = Window.partitionBy($"g_pri").orderBy($"pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = ranged.groupBy($"pid", $"g_pri").agg(sum($"gc").as("t"))
        .withColumn("off", coalesce(sum($"t").over(wOff), lit(0L)))
        .select($"pid".as("o_pid"), $"g_pri".as("o_pri"), $"off")
      val wp = Window.partitionBy($"pid", $"g_pri").orderBy($"g_price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = ranged
        .join(broadcast(offs), $"pid" === $"o_pid" && $"g_pri" === $"o_pri")
        .withColumn("cum_incl", sum($"gc").over(wp) + $"off")
        .withColumn("cum_excl", $"cum_incl" - $"gc")
        .select($"g_pri", $"g_price", $"cum_incl", $"cum_excl")
        .transform(Checkpoints.cut)
      val own = ord
        .join(cum.select($"g_pri", $"g_price", $"cum_incl".as("own_cum")),
          $"o_orderpriority" === $"g_pri" && $"o_totalprice" === $"g_price")
        .select($"o_orderkey", $"o_orderpriority", $"own_cum",
          ($"o_totalprice" - 5000.0d).as("frame_start"))
      graft.engine.plans.AsOfJoin.frames(
        own,
        cum.select($"g_pri".as("b_pri"), $"g_price".as("b_price"),
          $"cum_incl".as("b_incl"), $"cum_excl".as("b_excl")),
        leftKey = "o_orderpriority", rightKey = "b_pri",
        leftTime = "frame_start", rightTime = "b_price", rightTie = "b_price",
        outer = true)
        .withColumn("excluded", coalesce(
          when($"b_price" === $"frame_start", $"b_excl").otherwise($"b_incl"),
          lit(0L)))
        .select($"o_orderkey", $"o_orderpriority",
          (($"own_cum" - $"excluded").cast("double") / 100.0d).as("nearby_sum"))
        .transform(Checkpoints.cut)
        .orderBy($"o_orderkey")
    }

    // --- win_running V1: long cents accumulator -------------------------
    def winRunningV1: DataFrame = {
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      T.events(spark, d)
        .withColumn("pc", ($"value".cast(dec) * 100).cast("long"))
        .withColumn("running_value",
          (sum($"pc").over(w).cast(DecimalType(38, 0)) * cents).cast("double"))
        .select($"event_id", $"user_id", $"running_value")
        .orderBy($"event_id")
    }

    // --- win_moving V1 ---------------------------------------------------
    def winMovingV1: DataFrame = {
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(-2, 0)
      T.orders(spark, d)
        .withColumn("pc", ($"o_totalprice".cast(dec) * 100).cast("long"))
        .withColumn("mov_avg",
          ((sum($"pc").over(w).cast(DecimalType(38, 0)) * cents).cast("double") /
            count(lit(1)).over(w)))
        .select($"o_custkey", $"o_orderkey", $"mov_avg")
        .orderBy($"o_custkey", $"o_orderkey")
    }

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    def eq(a: => DataFrame, b: => DataFrame, label: String): Unit = {
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
      if (ra != rb) {
        ra.zip(rb).zipWithIndex.filter { case ((x, y), _) => x != y }.take(3)
          .foreach { case ((x, y), i) => println(s"  DIFF@$i\n   a=$x\n   b=$y") }
      }
    }
    eq(v0("win_range"), winRangeV1, "win_range")
    eq(v0("win_running"), winRunningV1, "win_running")
    eq(v0("win_moving"), winMovingV1, "win_moving")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "range_V0" -> (() => v0("win_range")), "range_V1" -> (() => winRangeV1),
      "run_V0" -> (() => v0("win_running")), "run_V1" -> (() => winRunningV1),
      "mov_V0" -> (() => v0("win_moving")), "mov_V1" -> (() => winMovingV1))
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

// Dev probe (r19 optimization round): A/B candidate restructures for
// the self-join family before committing. Lives in graft.engine.ops to
// reach the private helpers. Test tree only.
package graft.engine.ops

object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    // NOTE: no spark.implicits._ — package graft.engine.ops has its own
    // $-interpolator and the two would be ambiguous

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
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

    // --- fn_math: status quo vs cut before the presentation sort ---
    time("fnmath_A_status_quo")(
      graft.SparkEntry.queries("fn_math")(spark, sfDir))
    time("fnmath_B_cut_presort") {
      Checkpoints.cut(Tables.lineitem(spark, sfDir)
        .select(
          $"l_orderkey", $"l_linenumber",
          round($"l_extendedprice", 0).as("price_round"),
          abs($"l_discount" - 0.05).as("disc_dev"),
          ceil($"l_quantity").as("qty_ceil"),
          floor($"l_quantity" / 7).as("qty_div7"),
          pmod($"l_orderkey", lit(97)).as("key_mod"),
          round(pow($"l_quantity", 2), 4).as("qty_sq")))
        .orderBy($"l_orderkey", $"l_linenumber", $"price_round", $"disc_dev", $"qty_sq")
    }

    // --- project_expr A/B (same shape) ---
    time("projexpr_A_status_quo")(
      graft.SparkEntry.queries("project_expr")(spark, sfDir))
    time("projexpr_B_cut_presort") {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      Checkpoints.cut(Tables.lineitem(spark, sfDir)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .cast("double").as("disc_price")))
        .orderBy($"l_orderkey", $"l_linenumber", $"disc_price")
    }

    // --- agg_corr: decimal(38,0) sums vs plain long sums (CEILING probe:
    // the long variant is overflow-WRONG at this row count; timing only) ---
    time("aggcorr_A_status_quo")(
      graft.SparkEntry.queries("agg_corr")(spark, sfDir))
    time("aggcorr_B_long_ceiling") {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val li = Tables.lineitem(spark, sfDir)
      val xc = ($"l_quantity".cast(dec) * 100).cast("long")
      val yc = ($"l_extendedprice".cast(dec) * 100).cast("long")
      li.select($"l_returnflag", xc.as("xc"), yc.as("yc"))
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum($"xc").as("sxc"), sum($"yc").as("syc"),
          sum($"xc" * $"xc").as("sxxc"),
          sum($"yc" * $"yc").as("syyc"),
          sum($"xc" * $"yc").as("sxyc"))
        .orderBy($"l_returnflag")
    }

    // --- pipeline_clean decomposition ---
    time("pclean_full")(
      graft.SparkEntry.queries("pipeline_clean")(spark, sfDir))
    def toked() = {
      TextFeatures.ensureRegistered(spark)
      Tables.documents(spark, sfDir).repartition($"doc_id")
        .select($"doc_id", $"lang", $"text", TextFeatures.tokens($"text").as("toks"))
        .transform(Checkpoints.cut)
    }
    time("pclean_1_toked")(toked())
    time("pclean_2_rep_only") {
      toked()
        .select($"doc_id", explode(expr(
          "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) " +
            "ELSE array() END")).as("gram"))
        .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("cnt"))
        .groupBy($"doc_id")
        .agg(expr("cast(floor(cast(max(cnt) as double) / sum(cnt) * 10000D) as bigint)")
          .as("rep_bp"))
    }
    time("pclean_3_langhits_only") {
      toked()
        .withColumn("hits_en", expr("size(filter(toks, t -> t IN ('the','and','is','of','to')))"))
        .withColumn("hits_de", expr("size(filter(toks, t -> t IN ('der','die','das','und','ist')))"))
        .withColumn("hits_fr", expr("size(filter(toks, t -> t IN ('le','la','les','et','est')))"))
        .withColumn("hits_es", expr("size(filter(toks, t -> t IN ('el','los','las','es','y')))"))
        .select($"doc_id", $"hits_en", $"hits_de", $"hits_fr", $"hits_es")
    }

    spark.stop()
  }
}

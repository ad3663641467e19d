package graft

// Scratch dev probe (r20): second dedup wave.
//   dedup_substring: V1 = occurrence counts via count-over-window on g
//       (one pass) instead of occ-aggregate + join-back — the same
//       rewrite that took dedup_near/containment -40% this round.
//   dedup_fuzzy: V1 = cut before the presentation sort (the levenshtein
//       self-join otherwise runs twice under the range sampler).
// Not part of the engine; delete freely.
object ProbeD {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import spark.implicits._
    import graft.engine.{Tables => T}
    import graft.engine.ops.{Checkpoints, TextFeatures}
    import graft.engine.ops.DedupOps.SubstrK

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    def substringV1: DataFrame = {
      TextFeatures.ensureRegistered(spark)
      T.documents(spark, d)
        .select($"doc_id", $"text")
        .repartition($"doc_id")
        .withColumn("toks", TextFeatures.tokens($"text"))
        .filter(size($"toks") >= SubstrK)
        .select($"doc_id", explode(expr(s"graft_winhash(toks, $SubstrK)")).as("g"))
        .withColumn("occ", count(lit(1)).over(Window.partitionBy($"g")))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when($"occ" >= 2, 1L).otherwise(0L)).as("dup"))
        .withColumn("dup_bp", expr("dup * 10000 DIV n_windows"))
        .select($"doc_id", $"n_windows", $"dup_bp")
        .orderBy($"doc_id")
    }

    def fuzzyV1: DataFrame = {
      val b = T.documents(spark, d)
        .select($"doc_id", $"lang",
          substring(TextFeatures.normText($"text"), 1, 12).as("blk"),
          substring(TextFeatures.normText($"text"), 1, 60).as("head"))
      val a = b.select($"doc_id".as("id_a"), $"lang", $"blk", $"head".as("head_a"))
      val c = b.select($"doc_id".as("id_b"), $"lang", $"blk", $"head".as("head_b"))
      a.join(c, Seq("lang", "blk"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          levenshtein($"head_a", $"head_b").cast("long").as("dist"))
        .filter($"dist" <= 15)
        .transform(Checkpoints.cut)
        .orderBy($"id_a", $"id_b")
    }

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    def eq(a: => DataFrame, b: => DataFrame, label: String): Unit = {
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
    }
    eq(v0("dedup_substring"), substringV1, "substring")
    eq(v0("dedup_fuzzy"), fuzzyV1, "fuzzy")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "sub_V0" -> (() => v0("dedup_substring")), "sub_V1" -> (() => substringV1),
      "fuz_V0" -> (() => v0("dedup_fuzzy")), "fuz_V1" -> (() => fuzzyV1))
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

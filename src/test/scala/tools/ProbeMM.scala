package graft

// Scratch dev probe (r20): do the mm presentation sorts pay the codec
// twice? A global sort's RangePartitioner samples by EXECUTING the
// child once before the real pass — for a child that is a real
// PNG encode+decode, that is a full second codec pass. A/B:
//   V0 = production (sort directly above the decode pipeline)
//   V1 = Checkpoints.cut before the presentation sort (narrow rows
//        materialized once; sampler reads blocks) — the nearbySum
//        precedent. For mm_meta, V1b = sort the RAW rows first and
//        project above (fn_try precedent, zero materialization).
// Not part of the engine; delete freely.
object ProbeMM {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.engine.functions.VectorOps.register(spark)
    import graft.engine.multimodal.Multimodal
    import graft.engine.ops.Checkpoints

    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    def decodeV1: DataFrame =
      Multimodal.resizePlan(Multimodal.decodeImages(Multimodal.imageTable(spark, d)))
        .transform(Checkpoints.cut)
        .orderBy(col("media_id"))

    def phashV1: DataFrame =
      Multimodal.phashFrame(spark, d)
        .transform(Checkpoints.cut)
        .orderBy(col("media_id"))

    def framesV1: DataFrame = {
      import spark.implicits._
      Multimodal.sampleFrames(Multimodal.videoTable(spark, d)).toDF()
        .transform(Checkpoints.cut)
        .orderBy(col("media_id"))
    }

    def metaV1: DataFrame =
      graft.engine.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
          encode(col("text"), "UTF-8").as("content"))
        .select(col("media_id"), col("kind"),
          octet_length(col("content")).as("byte_len"),
          sha2(col("content"), 256).as("digest"))

    def v0(name: String) = graft.SparkEntry.queries(name)(spark, d)

    def eq(a: => DataFrame, b: => DataFrame, label: String): Unit = {
      val ra = a.collect().map(_.toString).toSeq
      clean()
      val rb = b.collect().map(_.toString).toSeq
      clean()
      println(s"EQ $label rows=${ra.size}/${rb.size} equal=${ra == rb}")
    }
    eq(v0("mm_decode"), decodeV1, "mm_decode")
    eq(v0("mm_phash"), phashV1, "mm_phash")
    eq(v0("mm_frames"), framesV1, "mm_frames")
    eq(v0("mm_meta"), metaV1, "mm_meta")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "decode_V0" -> (() => v0("mm_decode")), "decode_V1" -> (() => decodeV1),
      "phash_V0" -> (() => v0("mm_phash")), "phash_V1" -> (() => phashV1),
      "frames_V0" -> (() => v0("mm_frames")), "frames_V1" -> (() => framesV1),
      "meta_V0" -> (() => v0("mm_meta")), "meta_V1" -> (() => metaV1))
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

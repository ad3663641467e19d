// Scratch dev probe: same-JVM A/B of expression spellings over the
// sf0.1 documents corpus. Not part of the engine; delete freely.
// Test tree on purpose (no dev main ships); run via sbt "Test/runMain ProbeAB".
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    graft.engine.functions.VectorOps.register(spark)
    val d = "/root/testdata/sf0.1"
    val base = graft.engine.Tables.documents(spark, d)
      .select("doc_id", "text")
      .repartition(org.apache.spark.sql.functions.col("doc_id"))
      .selectExpr("doc_id", "graft_tokens(text) AS toks")
    def time(label: String, sql: String): Unit = {
      val df = base.selectExpr("doc_id", s"size($sql) AS n")
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"$label pass$p ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("warm", "toks")
    time("hof   ", graft.engine.ops.TextFeatures.shingleSetSql("toks"))
    time("native", "graft_shingles(toks)")
    time("hof2  ", graft.engine.ops.TextFeatures.shingleSetSql("toks"))
    time("native2", "graft_shingles(toks)")
    spark.stop()
  }
}

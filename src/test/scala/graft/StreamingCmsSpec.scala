package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The count-min sketch as a LIVE streaming aggregate: the same typed
  * `CmsAggregator` that builds `agg_countmin`'s batch sketch runs
  * unchanged inside a complete-mode streaming aggregation — the
  * fixed-size-state property that makes a sketch a sketch is exactly
  * what makes it streamable (the d×w table is the aggregation buffer,
  * merged across micro-batches by the engine). The live register
  * table must equal the batch build over the same keys once every
  * batch has been processed. */
class StreamingCmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("streamed CMS cells equal the batch sketch across micro-batches") {
    import spark.implicits._
    val keys = graft.engine.Tables.lineitem(spark, sf)
      .select($"l_partkey").as[Long].collect()
    val (b1, b2) = keys.splitAt(keys.length / 2)

    val cms = udaf(new graft.engine.functions.CmsAggregator(4, 256))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("pk")
      .agg(cms($"pk").as("cells"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_live").start()
    try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq) // second micro-batch: state must MERGE
      q.processAllAvailable()
      val live = spark.table("cms_live")
        .select(explode($"cells")).as[Long].collect().toSeq
      val batch = spark.createDataset(keys.toSeq).toDF("pk")
        .agg(cms($"pk").as("cells"))
        .select(explode($"cells")).as[Long].collect().toSeq
      assert(live.length == 4 * 256 && live == batch,
        "the live sketch must converge to the batch sketch cell-for-cell")
      assert(live.sum == keys.length * 4L,
        "every key contributes exactly d increments")
    } finally q.stop()
  }

  test("ANY micro-batch partition of the keys converges to the same sketch " +
    "(merge associativity, random + empty batches)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keys = graft.engine.Tables.lineitem(spark, sf)
      .select($"l_partkey").as[Long].collect().take(600)
    val cms = udaf(new graft.engine.functions.CmsAggregator(4, 256))
    val batchCells = spark.createDataset(keys.toSeq).toDF("pk")
      .agg(cms($"pk").as("cells"))
      .select(explode($"cells")).as[Long].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    // random cut points, duplicates allowed => some batches are EMPTY —
    // the state-merge path a half-split can never exercise
    val cutsGen = Gen.listOfN(4, Gen.chooseNum(0, keys.length))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3),
      Prop.forAll(cutsGen) { cuts =>
        val bounds = (0 +: cuts.sorted :+ keys.length).distinct
        val batches = bounds.zip(bounds.tail).map { case (a, b) =>
          keys.slice(a, b) }
        val input = MemoryStream[Long]
        val name = s"cms_rand_${System.nanoTime()}"
        val q = input.toDS().toDF("pk")
          .agg(cms($"pk").as("cells"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(name).start()
        try {
          batches.foreach { b =>
            if (b.nonEmpty) input.addData(b.toSeq)
            q.processAllAvailable()
          }
          val live = spark.table(name)
            .select(explode($"cells")).as[Long].collect().toSeq
          live == batchCells
        } finally q.stop()
      })
    assert(res.passed, res.status.toString)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** OutputMode.Complete coverage: a continuously-updated ranking (the
  * live dashboard shape — "current top event types by volume") must
  * re-emit the FULL result each micro-batch and converge to the batch
  * aggregate over the same rows. Complements the append-mode twins
  * (windows, joins, dedup, funnel) — complete is the mode for
  * unbounded aggregations with small result cardinality. */
class CompleteModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  test("complete-mode ranking converges to the batch counts across batches") {
    import spark.implicits._
    val events = graft.engine.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = input.toDS().toDF("event_type", "value")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"value").as("mx"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rank_live").start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      // mid-stream: the sink already holds a full (partial-data) ranking
      val mid = spark.sql("SELECT sum(n) FROM rank_live").head().getLong(0)
      assert(mid == b1.length, "complete mode re-emits the FULL aggregate")
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val live = spark.sql("SELECT event_type, n, mx FROM rank_live")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.engine.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"value").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(live == batch,
      "after all data, the complete-mode sink equals the batch aggregate")
  }
}

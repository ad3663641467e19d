package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingMedian
import graft.engine.streaming.StreamingMedian.MedEvent

/** The live rolling median must equal the batch bounded-frame window
  * when the testdata arrives in micro-batches whose boundaries cut
  * through users' series — the last-6-samples ring must survive the
  * seams or the frame (and therefore the median) shifts. */
class StreamingMedianSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("live rolling median equals the batch window exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "CAST(floor(value * 1000) AS BIGINT) AS v_mu")
      .as[MedEvent]
      .collect()
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
    assert(events.length > 100, "testdata sanity")
    val third = events.length / 3
    val batches = Seq(
      events.slice(0, third), events.slice(third, 2 * third),
      events.drop(2 * third))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MedEvent]
    val query = StreamingMedian.median(input.toDS())
      .writeStream
      .outputMode(StreamingMedian.outputMode)
      .format("memory")
      .queryName("live_median")
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
    } finally query.stop()

    val live = spark.sql("SELECT * FROM live_median").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.engine.ops.Relational8.winRollingMedian(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(live.size == events.length, "one median row per event")
    assert(live == batch,
      s"live-only: ${(live -- batch).take(3)}; batch-only: ${(batch -- live).take(3)}")
  }
}

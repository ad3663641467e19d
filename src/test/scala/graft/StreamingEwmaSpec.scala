package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingEwma
import graft.engine.streaming.StreamingEwma.EwmaEvent

/** Bounded-ring state on a LIVE stream: the smoother must emit the
  * exact batch `win_ewma` series when the testdata arrives in three
  * micro-batches with boundaries cutting through users' series — the
  * last-7-samples ring has to survive batch boundaries byte-for-byte
  * or renormalized weights diverge at the seam. */
class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("live EWMA equals the batch bounded-lag window exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "CAST(floor(value * 1000) AS BIGINT) AS v_mu")
      .as[EwmaEvent]
      .collect()
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
    assert(events.length > 100, "testdata sanity")
    val third = events.length / 3
    val batches = Seq(
      events.slice(0, third), events.slice(third, 2 * third),
      events.drop(2 * third))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val query = StreamingEwma.smooth(input.toDS())
      .writeStream
      .outputMode(StreamingEwma.outputMode)
      .format("memory")
      .queryName("live_ewma")
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
    } finally query.stop()

    val live = spark.sql("SELECT * FROM live_ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.engine.ops.Relational7.winEwma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(live.size == events.length, "one smoothed row per event")
    assert(live == batch,
      s"live-only: ${(live -- batch).take(3)}; batch-only: ${(batch -- live).take(3)}")
  }
}

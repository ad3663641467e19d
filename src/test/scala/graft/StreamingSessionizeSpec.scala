package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingSessionize
import graft.engine.streaming.StreamingSessionize.SessEvent

/** flatMapGroupsWithState + EventTimeTimeout on a LIVE stream: open
  * sessions are flushed by the WATERMARK, not by data. Fed the driver
  * testdata in three micro-batches (state and the per-user session
  * counter must survive batch boundaries and timeouts), then a
  * far-future sentinel advances the watermark so every real session
  * times out; the emitted set must equal the batch gaps-and-islands
  * query `ts_sessionize` on the same rows. */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("watermark-timed-out live sessions match the batch query exactly") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id")
      .as[SessEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    assert(events.length > 100, "testdata sanity")
    val third = events.length / 3
    val batches = Seq(
      events.slice(0, third), events.slice(third, 2 * third),
      events.drop(2 * third))

    // sentinel: one event far past every session's timeout instant —
    // the (global) watermark then flushes ALL users' open sessions
    val maxMs = events.map(_.ts.getTime).max
    val sentinel =
      SessEvent(events.head.user_id, new Timestamp(maxMs + 49L * 3600 * 1000),
        Long.MaxValue)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val query = StreamingSessionize.sessions(
        input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream
      .outputMode(StreamingSessionize.outputMode)
      .format("memory")
      .queryName("live_sessions")
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq); query.processAllAvailable()
      }
      input.addData(Seq(sentinel)); query.processAllAvailable()
      // timeouts fire against the watermark computed at the END of the
      // sentinel batch — one more batch lets them run
      input.addData(Seq(sentinel.copy(event_id = Long.MaxValue - 1)))
      query.processAllAvailable()
    } finally query.stop()

    val live = spark.sql("SELECT * FROM live_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .filter(_._4 <= maxMs * 1000L) // drop the sentinel's own session if flushed
      .toSet
    val batch = graft.engine.ops.Relational6.tsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(live == batch,
      s"live-only: ${(live -- batch).take(3)}; batch-only: ${(batch -- live).take(3)}")
  }
}

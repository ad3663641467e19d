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
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
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

  test("late events are dropped BEFORE the state machine, even under a " +
    "watermark jump — the poison-loop window does not open") {
    // The hazard: an admitted event whose session deadline (ts + 24 h)
    // lands behind the watermark would make setTimeoutTimestamp throw
    // and the checkpoint replay the poison batch forever. This pins the
    // Spark 4.1 semantics that close the window at the source — rows
    // older than the current watermark never reach update(), even when
    // a single batch jumps the watermark by 49 h (> the 24 h gap, the
    // worst case for the deadline arithmetic: had the t0+10 h event
    // been admitted, its t0+34 h deadline would sit 15 h behind the
    // t0+49 h watermark). The engine's update() additionally clamps
    // its timeout to watermark+1 as defense-in-depth should a future
    // Spark admit late rows here.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000
    val t0 = 1700000000000L
    val input = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessions(
        input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode(StreamingSessionize.outputMode)
      .format("memory").queryName("sess_backfill").start()
    try {
      input.addData(Seq(SessEvent(1L, new Timestamp(t0), 1L)))
      q.processAllAvailable() // after this batch: watermark t0
      // one batch JUMPS the watermark 49 h — more than the 24 h gap
      input.addData(Seq(SessEvent(1L, new Timestamp(t0 + 49 * h), 2L)))
      q.processAllAvailable()
      // late events under the jumped watermark: inside the jump window
      // (t0+10 h) and pre-t0 (backfill) — both must be dropped, not crash
      input.addData(Seq(
        SessEvent(2L, new Timestamp(t0 + 10 * h), 3L),
        SessEvent(3L, new Timestamp(t0 - 5 * h), 4L)))
      q.processAllAvailable()
      assert(q.isActive, "query must survive the late events")
      // flush everything via sentinel + one more advancing batch
      input.addData(Seq(SessEvent(1L, new Timestamp(t0 + 120 * h), 5L)))
      q.processAllAvailable()
      input.addData(Seq(SessEvent(1L, new Timestamp(t0 + 121 * h), 6L)))
      q.processAllAvailable()
      val users = spark.sql(
        "SELECT DISTINCT user_id FROM sess_backfill").collect()
        .map(_.getLong(0)).toSet
      assert(!users.contains(2L) && !users.contains(3L),
        "late events must be dropped before the state machine, not sessionized")
      assert(users.contains(1L), "on-time sessions still flush")
    } finally q.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingDedup
import graft.engine.streaming.StreamingDedup.Ev

/** Streaming dedup on a LIVE stream fed the driver testdata across a
  * micro-batch boundary, checked against the batch `stream_dedup`
  * query over the same rows — exact for the unbounded variant, and
  * the bounded variant's weaker within-watermark guarantee pinned. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def sortedEvents() = {
    import spark.implicits._
    graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[Ev].collect()
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id)) // stream arrival = event time
  }

  test("live dropDuplicates across a batch boundary equals the batch " +
    "first-arrival query") {
    import spark.implicits._
    val events = sortedEvents()
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDedup.firstArrivals(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_live").start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val live = spark.sql("SELECT user_id, event_type, event_id FROM dedup_live")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.engine.ops.StreamOps.streamDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(live == batch,
      "first arrival per key on the live stream = batch min_by(ts, event_id)")
  }

  test("watermark-bounded dedup never emits duplicates within the bound " +
    "and covers every key the exact dedup found") {
    import spark.implicits._
    val events = sortedEvents()
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDedup.firstArrivalsBounded(input.toDS(), "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_bounded").start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(
      "SELECT user_id, event_type, ts, event_id FROM dedup_bounded").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val exact = graft.engine.ops.StreamOps.streamDedup(spark, sf).count()
    // eviction can only re-admit keys, never lose the first arrival
    assert(rows.length >= exact,
      "bounded dedup emits at least one row per key")
    assert(rows.map(t => (t._1, t._2)).toSet.size ==
      spark.sql("SELECT DISTINCT user_id, event_type FROM dedup_bounded").count(),
      "key-set sanity")
    // the within-bound guarantee: two emits for the same key are
    // always further apart than the 1-hour lateness bound
    rows.groupBy(t => (t._1, t._2)).values.foreach { emits =>
      val ts = emits.map(_._3.getTime).sorted
      ts.zip(ts.tail).foreach { case (a, b) =>
        assert(b - a > 3600 * 1000L,
          s"duplicate emitted within the watermark bound: $emits")
      }
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StatefulStreaks
import graft.engine.streaming.StatefulStreaks.StreakEvent

/** mapGroupsWithState custom keyed state on a LIVE stream, fed the
  * driver testdata in two micro-batches (state must carry across the
  * batch boundary), checked against the batch gaps-and-islands query
  * `stream_state` over the same rows. */
class StatefulStreaksSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("live longest-streak state machine matches the batch islands query") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[StreakEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id)) // stream arrival = event time
    assert(events.length > 100, "testdata sanity")
    val (batch1, batch2) = events.splitAt(events.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreakEvent]
    val query = StatefulStreaks.longest(input.toDS())
      .writeStream
      .outputMode(StatefulStreaks.outputMode)
      .format("memory")
      .queryName("streaks")
      .start()
    try {
      input.addData(batch1.toIndexedSeq)
      query.processAllAvailable()
      input.addData(batch2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    // Update mode re-emits a user's streak each batch; `best` is
    // monotone, so the final state is the max emit per user
    val live = spark.sql("SELECT * FROM streaks").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
    val batch = graft.engine.ops.StreamOps.streamState(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(live == batch,
      s"diff: ${(live.toSet -- batch.toSet) ++ (batch.toSet -- live.toSet)}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StatefulStreaks
import graft.engine.streaming.StatefulStreaks.{StreakEvent, StreakState}

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
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id)) // stream arrival = event time
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

  test("ANY batch partition of the stream gives the same streaks " +
    "(state carry-over fuzz, random + empty batches)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sf = "/root/testdata/sf0.001"
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[StreakEvent]
      .collect()
      .sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
      .take(400)
    val batch = graft.engine.ops.StreamOps.streamState(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val expected = batch.filter { case (u, _) =>
      events.exists(_.user_id == u) } // truncated corpus: per-user recompute
    // the 400-row prefix may split a user's history differently than the
    // full corpus — recompute the reference over exactly these rows
    val ref = events.groupBy(_.user_id).map { case (u, es) =>
      val sorted = es.sortBy(e => (graft.engine.streaming.EventTime.micros(e.ts), e.event_id))
      var best = 0; var cur = 0; var prev: Option[String] = None
      sorted.foreach { e =>
        cur = if (prev.contains(e.event_type)) cur + 1 else 1
        best = math.max(best, cur); prev = Some(e.event_type)
      }
      u -> best
    }
    implicit val sqlCtx = spark.sqlContext
    val cutsGen = Gen.listOfN(3, Gen.chooseNum(0, events.length))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3),
      Prop.forAllNoShrink(cutsGen) { cuts =>
        val bounds = (0 +: cuts.sorted :+ events.length).distinct
        val batches = bounds.zip(bounds.tail).map { case (a, b) =>
          events.slice(a, b) }
        val input = MemoryStream[StreakEvent]
        val name = s"streaks_rand_${System.nanoTime()}"
        val q = StatefulStreaks.longest(input.toDS())
          .writeStream.outputMode(StatefulStreaks.outputMode)
          .format("memory").queryName(name).start()
        try {
          batches.foreach { b =>
            if (b.nonEmpty) input.addData(b.toIndexedSeq)
            q.processAllAvailable()
          }
          val live = spark.table(name).collect()
            .map(r => r.getLong(0) -> r.getInt(1))
            .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
          live == ref
        } finally q.stop()
      })
    assert(res.passed, res.status.toString)
    assert(expected.nonEmpty) // corpus sanity: the fuzz covered real users
  }

  test("same-millisecond events fold in full-microsecond order, not " +
    "getTime order (batch twin orders by full-precision ts)") {
    import java.sql.Timestamp
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ts(ms: Long, us: Int) = {
      val t = new Timestamp(ms); t.setNanos(us * 1000); t
    }
    // micros order: a(+100µs), b(+200µs), a(+300µs) → longest streak 1.
    // A getTime-based key ties all three at the same millisecond and
    // falls back to event_id — a(3), a(7), b(9) → longest 2, diverging
    // from the batch query's full-precision ordering.
    val events = Seq(
      StreakEvent(1L, "a", ts(1000L, 100), 7L),
      StreakEvent(1L, "b", ts(1000L, 200), 9L),
      StreakEvent(1L, "a", ts(1000L, 300), 3L))
    val state = TestGroupState.create[StreakState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val res = StatefulStreaks.update(1L, events.iterator, state)
    assert(res.longest == 1,
      "same-ms events must fold by full µs, like the batch twin")
  }
}

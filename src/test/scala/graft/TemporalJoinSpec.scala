package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.plans.AsOfJoin
import graft.engine.streaming.TemporalJoin
import graft.engine.streaming.TemporalJoin.Msg

/** The stateful streaming temporal join on a LIVE stream, fed in
  * time-ordered micro-batches (state must carry across the batch
  * boundary), checked against the native batch as-of operator on the
  * same rows. */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  // deterministic synthetic streams: 20 keys, 10 state rows + 10
  // events each, times interleaved
  private def states: Seq[Msg] = for {
    k <- 0L until 20L; i <- 0L until 10L
  } yield Msg(k, isState = true, time = i * 10 + (k % 3), tie = i,
    payload = k * 1000 + i)
  private def events: Seq[Msg] = for {
    k <- 0L until 20L; i <- 0L until 10L
  } yield Msg(k, isState = false, time = i * 10 + 5, tie = 100 + i,
    payload = 0L)

  test("live temporal join equals the native batch as-of across batch boundaries") {
    import spark.implicits._
    val all = (states ++ events).sortBy(m => (m.time, m.tie))
    val (b1, b2) = all.splitAt(all.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Msg]
    val q = TemporalJoin.enrich(in.toDS()).writeStream
      .outputMode(TemporalJoin.outputMode)
      .format("memory").queryName("temporal")
      .start()
    try {
      in.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val live = spark.sql("SELECT key, event_tie, state_payload FROM temporal")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(t => (t._1, t._2))

    val left = events.toDF()
      .selectExpr("key AS lk", "time AS lt", "tie AS event_tie")
    val right = states.toDF()
      .selectExpr("key AS rk", "time AS rt", "tie AS rtie",
        "payload AS state_payload")
    val batch = AsOfJoin.frames(left, right, "lk", "rk", "lt", "rt", "rtie",
      outer = true)
      .select($"lk", $"event_tie", $"state_payload").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(t => (t._1, t._2))

    assert(live.length == events.length, "append mode: one row per event")
    assert(live.toSeq == batch.toSeq)
  }

  test("a state row at the same time as an event matches it (as-of <=)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Msg]
    val q = TemporalJoin.enrich(in.toDS()).writeStream
      .outputMode(TemporalJoin.outputMode)
      .format("memory").queryName("temporal_eq")
      .start()
    try {
      in.addData(
        Msg(1L, isState = true, time = 50L, tie = 1L, payload = 7L),
        Msg(1L, isState = false, time = 50L, tie = 100L, payload = 0L),
        Msg(2L, isState = false, time = 50L, tie = 100L, payload = 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT key, state_payload FROM temporal_eq").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(7L), 2L -> None))
  }
}

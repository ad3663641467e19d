package graft.engine.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with EVENT-TIME TIMEOUT — the live twin of
  * the batch gaps-and-islands query `ts_sessionize`
  * (graft.engine.ops.Relational6.tsSessionize), spec-checked to emit
  * the identical session set on the same data.
  *
  * The piece no other state op here exercises: a session has no
  * natural closing event, so the state machine must be woken by the
  * WATERMARK, not by data — `GroupStateTimeout.EventTimeTimeout` with
  * `setTimeoutTimestamp(lastSeen + gap)`. When the watermark passes
  * that instant the open session is flushed exactly once (Append
  * mode), which is what makes the operator emit complete sessions
  * instead of per-event updates.
  *
  * State per user is one open session (id, start, last, count) plus
  * the monotone session counter — O(users) memory regardless of
  * stream length. The counter survives session close (the state is
  * kept with `open = false` rather than removed) so session ids keep
  * matching the batch query's 1-based per-user numbering across an
  * arbitrary number of timeouts. */
object StreamingSessionize {
  final case class SessEvent(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessState(
      sessId: Long, startUs: Long, lastUs: Long, n: Long, open: Boolean)
  final case class Session(user_id: Long, sess_id: Long, n_events: Long,
      start_us: Long, end_us: Long, dur_us: Long)

  /** Same 24 h silence threshold as the batch query. */
  val GapUs: Long = 86400000000L

  private def micros(ts: Timestamp): Long = EventTime.micros(ts)

  private def closed(userId: Long, st: SessState): Session =
    Session(userId, st.sessId, st.n, st.startUs, st.lastUs,
      st.lastUs - st.startUs)

  def update(userId: Long, events: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed lastSeen + gap with no new events: flush the
      // open session, keep the counter for correct future numbering
      val st = state.get
      state.update(st.copy(open = false))
      Iterator.single(closed(userId, st))
    } else {
      val out = ArrayBuffer[Session]()
      var st = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L, open = false))
      events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        if (!st.open) {
          st = SessState(st.sessId + 1, us, us, 1L, open = true)
        } else if (us - st.lastUs > GapUs) {
          out += closed(userId, st)
          st = SessState(st.sessId + 1, us, us, 1L, open = true)
        } else {
          st = st.copy(lastUs = us, n = st.n + 1)
        }
      }
      state.update(st)
      // deadline rounds UP to the millisecond: flooring (lastUs+gap)/1000
      // would let the timeout fire up to 1 ms early, splitting a session
      // whose gap lands in (GapUs - 999us, GapUs] — diverging from the
      // batch twin's strict `> GapUs` cut on sub-ms timestamps.
      //
      // CLAMPED to the watermark, as defense-in-depth: an admitted
      // event with ts+gap behind the watermark would make
      // setTimeoutTimestamp throw, fail the batch, and replay the same
      // poison batch from the checkpoint forever (the loop
      // ControlStream hardens against). Probed on Spark 4.1: this
      // operator drops ALL rows older than the current watermark
      // before update() runs (StreamingSessionizeSpec pins that —
      // even under a 49 h single-batch watermark jump nothing older is
      // admitted), so with gap > 0 every admitted event yields
      // deadline ≥ watermark + gap and the clamp is inert today. It
      // stays because the cost is one max() and the failure mode it
      // rules out is an unrecoverable crash-loop if a future Spark
      // admits late rows here (the documented contract leaves that
      // open — "the watermark only drives timeouts").
      if (st.open)
        state.setTimeoutTimestamp(math.max(
          (st.lastUs + GapUs + 999L) / 1000L,
          state.getCurrentWatermarkMs() + 1L))
      out.iterator
    }
  }

  /** Wire the sessionizer over a (streaming) Dataset. The caller must
    * have a watermark on `ts` — EventTimeTimeout requires one. */
  def sessions(events: Dataset[SessEvent]): Dataset[Session] = {
    import events.sparkSession.implicits._
    StateStores.configure(events.sparkSession)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Append()
}

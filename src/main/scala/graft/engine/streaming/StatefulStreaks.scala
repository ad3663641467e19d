package graft.engine.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a live stream:
  * `KeyValueGroupedDataset.mapGroupsWithState` computing each user's
  * longest streak of consecutive same-type events — the streaming twin
  * of the batch gaps-and-islands query `stream_state`
  * (graft.engine.ops.StreamOps.streamState), spec-checked to produce
  * identical results on the same data.
  *
  * State per user is three fields (last type, current run, best run) —
  * O(users) memory regardless of stream length, the property that makes
  * custom state viable at 100 TB where any buffer-the-events design
  * dies. Events are sorted by (ts, event_id) WITHIN each micro-batch;
  * cross-batch order is the stream's arrival order, exactly
  * mapGroupsWithState's contract (an out-of-order-tolerant version
  * would keep a small reorder buffer keyed by watermark — same state
  * shape, later flush). */
object StatefulStreaks {
  final case class StreakEvent(
      user_id: Long, event_type: String, ts: Timestamp, event_id: Long)
  final case class StreakState(last: String, cur: Int, best: Int)
  final case class UserStreak(user_id: Long, longest: Int)

  /** One state transition: fold a micro-batch's events (event-time
    * order) into the running (last, cur, best) machine. */
  def update(userId: Long, events: Iterator[StreakEvent],
      state: GroupState[StreakState]): UserStreak = {
    var st = state.getOption.getOrElse(StreakState(null, 0, 0))
    // full-µs sort key: getTime truncates to millis, and the batch twin
    // orders by full-precision ts — same-millisecond events of different
    // types would fold in a different order and change the streak
    events.toSeq.sortBy(e => (EventTime.micros(e.ts), e.event_id)).foreach { e =>
      val cur = if (e.event_type == st.last) st.cur + 1 else 1
      st = StreakState(e.event_type, cur, math.max(st.best, cur))
    }
    state.update(st)
    UserStreak(userId, st.best)
  }

  /** Wire the state machine over a (streaming) Dataset. Update output
    * mode: each micro-batch emits the refreshed streak for the users
    * it touched. */
  def longest(events: Dataset[StreakEvent]): Dataset[UserStreak] = {
    import events.sparkSession.implicits._
    StateStores.configure(events.sparkSession)
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Update()
}

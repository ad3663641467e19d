package graft.engine.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Conversion funnel as custom keyed state on Spark 4's
  * `transformWithState` API — the LIVE twin of the batch
  * `stream_funnel` query (graft.engine.ops.StreamOps.streamFunnel:
  * per user, deepest stage of click→view→purchase where each stage's
  * first qualifying event falls within 1 hour of the previous match).
  *
  * State per user is three stage timestamps (epoch µs, -1 = unset) in
  * a single `ValueState` — O(users) memory, and because stage matches
  * are greedy-first in event time, each slot writes at most once, so
  * the machine is idempotent to re-emits. Events are folded in
  * (ts, event_id) order within each micro-batch; cross-batch order is
  * arrival order (the `transformWithState` contract, same as the
  * other live twins here). FunnelStateSpec matches the machine
  * against the batch window query across a micro-batch boundary.
  *
  * Unlike `mapGroupsWithState` (see [[StatefulStreaks]]), this is the
  * arbitrary-state API: typed state handles with per-state TTL,
  * multiple states per key, and timers — and it requires the RocksDB
  * state store provider, which is what makes O(users) state spill
  * beyond executor heap at production scale. */
object FunnelState {
  final case class Ev(
      user_id: Long, event_type: String, ts: Timestamp, event_id: Long)
  final case class Stages(t1: Long, t2: Long, t3: Long)
  final case class Funnel(
      user_id: Long, depth: Int,
      t1s: Option[Long], t2s: Option[Long], t3s: Option[Long])

  private val HourUs = 3600L * 1000000L

  /** Full-precision epoch microseconds of a Timestamp (getTime alone
    * truncates to millis — the batch twin compares in µs). */
  def micros(ts: Timestamp): Long = EventTime.micros(ts)

  /** Fold order at EQUAL microseconds: a stage's dependency first.
    * The batch twin's conditions are purely time-based (`view.ts >=
    * t1` qualifies AT equality), but the slots here are write-once —
    * a view folded before its same-µs click would be discarded with
    * t1 still unset and the funnel stuck a stage short of the batch
    * result. Ordering click < view < purchase at equal time makes the
    * greedy fold reach exactly the batch depths. */
  private val StagePrio =
    Map("click" -> 0, "view" -> 1, "purchase" -> 2).withDefaultValue(3)

  class Processor extends StatefulProcessor[Long, Ev, Funnel] {
    @transient private var stages: ValueState[Stages] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stages = getHandle.getValueState[Stages](
        "stages", Encoders.product[Stages], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Funnel] = {
      var s = if (stages.exists()) stages.get() else Stages(-1L, -1L, -1L)
      rows.toSeq.sortBy(e =>
        (micros(e.ts), StagePrio(e.event_type), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        e.event_type match {
          case "click" if s.t1 < 0 => s = s.copy(t1 = t)
          case "view" if s.t1 >= 0 && s.t2 < 0 &&
            t >= s.t1 && t <= s.t1 + HourUs => s = s.copy(t2 = t)
          case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
            t >= s.t2 && t <= s.t2 + HourUs => s = s.copy(t3 = t)
          case _ => ()
        }
      }
      stages.update(s)
      val depth = if (s.t3 >= 0) 3 else if (s.t2 >= 0) 2
        else if (s.t1 >= 0) 1 else 0
      def sec(us: Long): Option[Long] =
        if (us >= 0) Some(us / 1000000L) else None
      Iterator.single(Funnel(key, depth, sec(s.t1), sec(s.t2), sec(s.t3)))
    }
  }

  /** Wire the funnel machine over a (streaming) Dataset. Update mode:
    * each micro-batch re-emits the refreshed funnel for touched
    * users; stage slots are write-once so emits are monotone in
    * depth. */
  def funnel(events: Dataset[Ev]): Dataset[Funnel] = {
    import events.sparkSession.implicits._
    // transformWithState runs only on RocksDB — pin it (generic
    // configure() would honor knob=hdfs and the query would fail at
    // start; StateStoresSpec pins the conflict error)
    StateStores.configureForTws(events.sparkSession)
    events.groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}

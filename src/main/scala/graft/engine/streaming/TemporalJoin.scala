package graft.engine.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming temporal join (the live twin of the native batch
  * as-of operator, `graft.engine.plans.AsOfJoinExec`): a keyed state
  * stream and an event stream arrive interleaved; every event is
  * enriched with the key's LATEST state at-or-before its event time
  * among the state rows that have arrived so far.
  *
  * `flatMapGroupsWithState` keeps exactly ONE state row per key — the
  * greatest (time, tie) seen — so memory is O(keys) regardless of
  * stream length, the property that makes the operator viable at
  * 100 TB (the alternative, Spark's built-in stream-stream join,
  * buffers BOTH sides' windows in the state store). Within a
  * micro-batch, messages fold in (time, state-before-event, tie)
  * order, so a state update at time t applies to events at the same t
  * (as-of `<=` semantics); across batches the stream's arrival order
  * is the contract, exactly as for [[StatefulStreaks]] — with
  * watermark-ordered arrival, the live result equals the batch as-of
  * (spec-checked against AsOfJoinExec on the same rows).
  */
object TemporalJoin {
  /** One message of the unioned stream: a state row (`isState`) or an
    * event to enrich. `tie` breaks equal times (state) / identifies
    * the event (event). */
  final case class Msg(
      key: Long, isState: Boolean, time: Long, tie: Long, payload: Long)
  final case class Latest(time: Long, tie: Long, payload: Long)
  final case class Enriched(
      key: Long, event_tie: Long, event_time: Long,
      state_time: Option[Long], state_payload: Option[Long])

  /** One state transition: fold a micro-batch's messages for a key in
    * event-time order; unmatched events emit null-padded (outer
    * semantics — the caller filters if it wants inner). */
  def update(key: Long, msgs: Iterator[Msg],
      state: GroupState[Latest]): Iterator[Enriched] = {
    var st = state.getOption
    val out = List.newBuilder[Enriched]
    // state sorts before events at the same time: as-of matches <=
    msgs.toSeq.sortBy(m => (m.time, if (m.isState) 0 else 1, m.tie))
      .foreach { m =>
        if (m.isState) {
          if (st.forall(s => s.time < m.time ||
              (s.time == m.time && s.tie < m.tie)))
            st = Some(Latest(m.time, m.tie, m.payload))
        } else out += Enriched(key, m.tie, m.time,
          st.map(_.time), st.map(_.payload))
      }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Wire the temporal join over a (streaming) unioned message
    * Dataset. Append mode: each event row is emitted exactly once,
    * enriched at its arrival batch. */
  def enrich(msgs: Dataset[Msg]): Dataset[Enriched] = {
    import msgs.sparkSession.implicits._
    StateStores.configure(msgs.sparkSession)
    msgs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Append()
}

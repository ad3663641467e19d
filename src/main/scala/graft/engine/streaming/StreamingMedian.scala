package graft.engine.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling median — the live twin of the batch bounded-frame
  * `win_rolling_median` (graft.engine.ops.Relational8.winRollingMedian),
  * spec-checked to emit the identical robust-smoothed series.
  *
  * Same bounded-ring state shape as [[StreamingEwma]]: the last K−1
  * samples per key, O(keys · K) memory regardless of stream length.
  * Each event appends to the ring, sorts a ≤K-element copy and takes
  * the lower median `sorted[(m+1)/2 − 1]` — an actual sample value,
  * so the whole path stays in Long and agrees bit-for-bit with the
  * batch `sort_array(collect_list)` spelling on both engines.
  *
  * Within a micro-batch events sort by (event-time, event_id), the
  * batch window's total order; across micro-batches the caller feeds
  * data watermark-ordered (stragglers are the `stream_late` contract,
  * not this operator's). */
object StreamingMedian {
  final case class MedEvent(
      user_id: Long, ts: Timestamp, event_id: Long, v_mu: Long)
  final case class Ring(vs: Seq[Long])
  final case class Med(
      user_id: Long, event_id: Long, v_mu: Long, med_mu: Long)

  /** Frame width — matches the batch query's 6 preceding + current. */
  val K: Int = graft.engine.ops.Relational8.MedianK

  private def micros(ts: Timestamp): Long = EventTime.micros(ts)

  def update(userId: Long, events: Iterator[MedEvent],
      state: GroupState[Ring]): Iterator[Med] = {
    var ring: Seq[Long] = state.getOption.map(_.vs).getOrElse(Seq.empty)
    val out = ArrayBuffer[Med]()
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val frame = (ring :+ e.v_mu).takeRight(K)
      val sorted = frame.sorted
      out += Med(userId, e.event_id, e.v_mu, sorted((frame.length + 1) / 2 - 1))
      ring = frame.takeRight(K - 1)
    }
    state.update(Ring(ring))
    out.iterator
  }

  /** Wire the median over a (streaming) Dataset. No timeout: emits on
    * every event, state is a pure sliding frame. */
  def median(events: Dataset[MedEvent]): Dataset[Med] = {
    import events.sparkSession.implicits._
    StateStores.configure(events.sparkSession)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Append()
}

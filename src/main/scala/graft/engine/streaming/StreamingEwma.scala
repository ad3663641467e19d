package graft.engine.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — the live twin of the batch bounded-lag smoother
  * `win_ewma` (graft.engine.ops.Relational7.winEwma), spec-checked to
  * emit the identical smoothed series on the same data.
  *
  * The state-management pattern no other op here exercises: a BOUNDED
  * RING of the last K−1 samples per key. The batch query gets its
  * frame from 7 `lag` windows; the stream cannot look back, so state
  * carries exactly the window the next event will need — O(keys · K)
  * memory regardless of stream length, the smallest state that makes
  * the operators emit-for-emit identical. Weights mirror the batch
  * side: frame element j of m (oldest = 0) weighs `2^(K−m+j)`, so the
  * newest always carries 2⁷ and the weighted mean renormalizes near
  * the series head exactly as the batch `CASE WHEN lag IS NULL` terms
  * do. Scala's `/` and Spark's `DIV` both truncate toward zero, so
  * negative milli-values agree too.
  *
  * Within one micro-batch events sort by (event-time, event_id) —
  * the same total order as the batch window. Across micro-batches the
  * caller feeds data watermark-ordered (a production deployment drops
  * pre-watermark stragglers exactly like `stream_late`); the spec
  * drives batch boundaries mid-user to prove the ring survives. */
object StreamingEwma {
  final case class EwmaEvent(
      user_id: Long, ts: Timestamp, event_id: Long, v_mu: Long)
  final case class Ring(vs: Seq[Long])
  final case class Smoothed(
      user_id: Long, event_id: Long, v_mu: Long, ewma_mu: Long)

  /** Frame width — matches the batch query's current + 7 lags. */
  val K: Int = graft.engine.ops.Relational7.EwmaK

  private def micros(ts: Timestamp): Long = EventTime.micros(ts)

  def update(userId: Long, events: Iterator[EwmaEvent],
      state: GroupState[Ring]): Iterator[Smoothed] = {
    var ring: Seq[Long] = state.getOption.map(_.vs).getOrElse(Seq.empty)
    val out = ArrayBuffer[Smoothed]()
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val frame = (ring :+ e.v_mu).takeRight(K)
      val m = frame.length
      var num = 0L
      var den = 0L
      var j = 0
      while (j < m) {
        val w = 1L << (K - m + j)
        num += frame(j) * w
        den += w
        j += 1
      }
      out += Smoothed(userId, e.event_id, e.v_mu, num / den)
      ring = frame.takeRight(K - 1) // next event needs at most K-1 lags
    }
    state.update(Ring(ring))
    out.iterator
  }

  /** Wire the smoother over a (streaming) Dataset. No timeout: the
    * EWMA emits on every event, state is a pure sliding frame. */
  def smooth(events: Dataset[EwmaEvent]): Dataset[Smoothed] = {
    import events.sparkSession.implicits._
    StateStores.configure(events.sparkSession)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  val outputMode: OutputMode = OutputMode.Append()
}

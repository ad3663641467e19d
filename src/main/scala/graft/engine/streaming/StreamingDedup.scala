package graft.engine.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming deduplication — the LIVE twin of the batch `stream_dedup`
  * query (graft.engine.ops.StreamOps.streamDedup: first event per
  * (user, type) in (ts, event_id) order).
  *
  * Two variants with an explicit state/semantics trade:
  *
  *  - [[firstArrivals]]: `dropDuplicates` on the stream — first
  *    ARRIVAL per key wins, state grows with the key domain and is
  *    never evicted. "First" is defined by per-key arrival order:
  *    exact whenever each key's events reach the stream in (ts,
  *    event_id) order — precisely the guarantee of a keyed topic
  *    source (a key lives in ONE topic partition, per-key ordered,
  *    and a shuffle preserves each mapper's row order per reducer).
  *    On a source whose partitions interleave one key's events,
  *    which row of an intra-batch tie survives is arrival-
  *    nondeterministic — match the batch twin's `min_by(struct(ts,
  *    event_id))` there by ordering the source, not by trusting the
  *    operator. Right when the key space is bounded (users × types
  *    here); at 100 TB of unbounded keys it is the variant that
  *    OOMs, which is why Spark added the bounded form.
  *  - [[firstArrivalsBounded]]: `dropDuplicatesWithinWatermark` —
  *    state for a key is dropped once the watermark passes its event
  *    time + the lateness bound, so memory is O(keys active within
  *    the watermark window). The guarantee weakens to "no duplicates
  *    WITHIN the bound": a duplicate arriving after its key's state
  *    was evicted is re-emitted as new. The spec pins both semantics
  *    against the batch query.
  */
object StreamingDedup {
  final case class Ev(
      user_id: Long, event_type: String, ts: Timestamp, event_id: Long)

  /** Exact global dedup: first arrival per (user, type), state never
    * evicted. */
  def firstArrivals(events: Dataset[Ev]): Dataset[Ev] = {
    StateStores.configure(events.sparkSession)
    events.dropDuplicates("user_id", "event_type")
  }

  /** Watermark-bounded dedup: duplicates suppressed only within
    * `lateness` of the first arrival's event time. */
  def firstArrivalsBounded(events: Dataset[Ev], lateness: String): Dataset[Ev] = {
    StateStores.configure(events.sparkSession)
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
  }
}

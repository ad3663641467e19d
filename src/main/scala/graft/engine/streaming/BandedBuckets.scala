package graft.engine.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.GroupState

/** The shared banded-bucket state fold behind [[StreamingMinHash]] and
  * [[StreamingSimhash]]: one LSH/banding bucket's stored members live
  * in `GroupState[Seq[M]]`; each micro-batch's new members (folded in
  * ascending id order for deterministic intra-batch behavior) pair
  * against every stored member, then join the stored set — unless the
  * bucket is at the admission cap.
  *
  * The cap is ADMISSION CONTROL, the streaming recast of the batch
  * df-cap family: once a bucket holds `cap` members, later arrivals
  * neither pair in it nor join it (they still pair through their other
  * bands), so per-bucket work and state are bounded by cap² / cap no
  * matter how degenerate the corpus — batch drops an oversized bucket
  * retroactively, a stream can only stop admitting; same recall
  * trade, applied prefix-first.
  *
  * Membership is checked against a HashSet (and members accumulate in
  * a buffer), so folding k arrivals into a bucket of n costs
  * O(k·n) for the pairing itself — the candidate generation — and
  * nothing extra: the earlier per-file spellings paid an O(n) linear
  * `exists` scan plus an O(n) Seq copy per arrival on top, quadratic
  * per micro-batch on a hot bucket before any pairing.
  *
  * Re-deliveries (same id) are ignored — id is the identity, which is
  * what makes the fold idempotent under at-least-once delivery. */
private[streaming] object BandedBuckets {
  def fold[M, P](
      state: GroupState[Seq[M]],
      arrivals: Iterator[M],
      id: M => Long,
      cap: Long,
      pair: (M, M) => Option[P]): Iterator[P] = {
    val seen = mutable.ArrayBuffer.from(state.getOption.getOrElse(Seq.empty))
    val ids = mutable.HashSet.from(seen.map(id))
    val out = List.newBuilder[P]
    arrivals.toSeq.sortBy(id).foreach { m =>
      if (!ids.contains(id(m)) && seen.size < cap) {
        seen.foreach { o => pair(o, m).foreach(out += _) }
        seen += m
        ids += id(m)
      }
    }
    state.update(seen.toSeq)
    out.result().iterator
  }
}

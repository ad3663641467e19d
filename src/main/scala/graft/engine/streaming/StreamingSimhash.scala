package graft.engine.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SimHash near-duplicate detection — the LIVE twin of the
  * batch `dedup_simhash_dup` banding join: every arriving document's
  * 32-bit fingerprint is checked against all previously seen
  * fingerprints sharing an 8-bit band, emitting pairs within Hamming
  * distance ≤ 3 as the stream flows. The same pigeonhole argument as
  * the batch operator makes the banding lossless at the threshold:
  * a pair within distance 3 agrees exactly on ≥ 1 of the 4 bands.
  *
  * State is keyed by (band, value) (`flatMapGroupsWithState`): each
  * bucket holds only (doc_id, fingerprint) pairs — 16 bytes/member,
  * never text. The batch df-cap becomes ADMISSION CONTROL here: once
  * a bucket holds `DedupOps.SimhashMaxBand` members, later arrivals
  * neither pair in it nor join it (they still pair through their
  * other three bands), so per-bucket work is bounded by cap² exactly
  * like the batch guard — the difference is that batch drops an
  * oversized bucket retroactively while a stream can only stop
  * admitting, which is the same recall trade applied prefix-first.
  * In production the state rides RocksDB and a GroupStateTimeout
  * turns this into trailing-window dedup on an unbounded crawl.
  *
  * StreamingSimhashSpec feeds the driver corpus's REAL fingerprints
  * (from the batch `graft_simhash` expression) across random
  * micro-batch cuts and matches the emitted pair set against an
  * independent in-memory banding computation.
  */
object StreamingSimhash {
  /** A document's 32-bit SimHash fingerprint. */
  final case class DocFp(doc_id: Long, simhash: Long)
  /** One (band bucket, member) message. */
  final case class BandMsg(band_key: String, doc_id: Long, simhash: Long)
  /** Near-dup pair + exact Hamming distance (≤ 3). */
  final case class DupPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Hamming threshold — must match the batch operator's verify. */
  val MaxHamming = 3

  /** The 4 disjoint 8-bit band keys of a fingerprint. Must bucket
    * exactly like the batch operator's `(b, (simhash >> b·8) & 255)`. */
  def bandKeys(fp: Long): Seq[String] =
    (0 until 4).map(b => s"$b:${(fp >> (b * 8)) & 255}")

  /** One bucket's transition — the shared [[BandedBuckets]] fold with
    * the inline popcount verify as the pair filter. */
  def update(key: String, msgs: Iterator[BandMsg],
      state: GroupState[Seq[DocFp]]): Iterator[DupPair] =
    BandedBuckets.fold[DocFp, DupPair](
      state,
      msgs.map(m => DocFp(m.doc_id, m.simhash)),
      _.doc_id,
      graft.engine.ops.DedupOps.SimhashMaxBand,
      (o, m) => {
        val h = java.lang.Long.bitCount(o.simhash ^ m.simhash)
        if (h <= MaxHamming)
          Some(if (o.doc_id < m.doc_id) DupPair(o.doc_id, m.doc_id, h)
               else DupPair(m.doc_id, o.doc_id, h))
        else None
      })

  /** Wire the detector over a (streaming) fingerprint Dataset. A pair
    * agreeing on k bands emits k times with the same distance —
    * distinct downstream (the spec does; a production sink upserts). */
  def duplicates(docs: Dataset[DocFp]): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    StateStores.configure(docs.sparkSession)
    docs.flatMap(d => bandKeys(d.simhash).map(k => BandMsg(k, d.doc_id, d.simhash)))
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

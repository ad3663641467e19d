package graft.engine.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash/LSH near-duplicate detection — the LIVE twin of
  * the batch `dedup_minhash` candidate generator: every arriving
  * document is checked against ALL previously seen documents that
  * share an LSH band bucket, emitting candidate pairs with their
  * signature-estimated similarity as the stream flows (the "is this
  * new crawl page a near-dup of anything we already have" shape of an
  * incremental ingestion pipeline).
  *
  * State is keyed by BAND BUCKET (`flatMapGroupsWithState`): each
  * bucket holds the compact signatures (16 longs/doc) of its member
  * docs — never shingle sets or text. Memory is O(corpus × bands)
  * signatures, each bucket bounded by the [[MaxBand]] admission cap
  * (see [[BandedBuckets]]); in production the state rides RocksDB
  * beyond heap, and a state TTL (GroupStateTimeout) turns it into
  * "dedup against the trailing window" when the corpus is unbounded. The estimated
  * similarity is `matches/16` over the FULL signature — the standard
  * MinHash Jaccard estimator; candidates feed the same exact verify
  * as the batch operator when shingle storage is available.
  *
  * The spec (StreamingMinHashSpec) feeds the driver corpus's real
  * signatures across a micro-batch boundary and matches the emitted
  * pair set against an independent in-memory LSH computation.
  */
object StreamingMinHash {
  /** A document's MinHash signature (16 permutation minima). */
  final case class DocSig(doc_id: Long, sig: Seq[Long])
  /** One (band bucket, member) message. */
  final case class BandMsg(band_key: String, doc_id: Long, sig: Seq[Long])
  /** Candidate pair + number of matching signature positions (of 16). */
  final case class CandPair(doc_a: Long, doc_b: Long, matches: Int)

  /** LSH(4×4) band keys: band index + that band's 4 minima. Must
    * partition docs exactly like the batch operator's
    * `concat_ws('_', mh…)` stack — same bands, same rows. */
  def bandKeys(sig: Seq[Long]): Seq[String] =
    (0 until 4).map(b => s"$b:${sig.slice(b * 4, b * 4 + 4).mkString("_")}")

  /** Admission cap per band bucket — the same bound (and the same
    * argument) as the batch simhash family's
    * [[graft.engine.ops.DedupOps.SimhashMaxBand]]: a bucket this hot
    * is a degenerate signature (boilerplate shingles), and C(n,2)
    * candidate pairs from one bucket would dominate all useful work.
    * Inert on the spec corpus (largest bucket ≪ cap — asserted there,
    * which is what keeps the spec's uncapped oracle exact).
    *
    * Over-cap divergence from the batch twin is ASYMMETRIC, not just
    * "stop admitting": the batch operator DROPS an over-cap bucket
    * entirely (zero pairs from it), while this fold has already
    * emitted C(cap, 2) pairs from the first `cap` members by the time
    * the cap bites. Twin-comparison harnesses must therefore exclude
    * the over-cap regime (as the spec corpus does by construction);
    * in that regime the two operators trade recall differently by
    * design — streaming favors the earliest-seen members, batch
    * declares the whole bucket boilerplate. */
  val MaxBand: Long = graft.engine.ops.DedupOps.SimhashMaxBand

  /** One bucket's transition — the shared [[BandedBuckets]] fold with
    * the full-signature match count as the pair payload. */
  def update(key: String, msgs: Iterator[BandMsg],
      state: GroupState[Seq[DocSig]]): Iterator[CandPair] =
    BandedBuckets.fold[DocSig, CandPair](
      state,
      msgs.map(m => DocSig(m.doc_id, m.sig)),
      _.doc_id,
      MaxBand,
      (o, m) => {
        val matches = o.sig.zip(m.sig).count { case (a, b) => a == b }
        Some(if (o.doc_id < m.doc_id) CandPair(o.doc_id, m.doc_id, matches)
             else CandPair(m.doc_id, o.doc_id, matches))
      })

  /** Wire the detector over a (streaming) signature Dataset. A pair
    * sharing k bands emits k times with the same `matches` — distinct
    * downstream (the spec does; a production sink upserts). */
  def candidates(docs: Dataset[DocSig]): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    StateStores.configure(docs.sparkSession)
    docs.flatMap(d => bandKeys(d.sig).map(k => BandMsg(k, d.doc_id, d.sig)))
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

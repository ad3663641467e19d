package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingMinHash
import graft.engine.streaming.StreamingMinHash.DocSig

/** Streaming LSH dedup on a LIVE stream fed the driver corpus's REAL
  * MinHash signatures (the same `DedupOps.minhashSigs` build the
  * batch operator gates differentially) across a micro-batch
  * boundary, matched against an independent in-memory LSH
  * computation over the same signatures. */
class StreamingMinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def signatures(): Array[DocSig] = {
    val sigs = graft.engine.ops.DedupOps.minhashSigs(
      graft.engine.ops.DedupOps.shingledDocs(spark, sf))
    sigs.collect().map { r =>
      DocSig(r.getLong(0), (1 to 16).map(r.getLong(_)))
    }.filter(_.sig.nonEmpty).sortBy(_.doc_id)
  }

  private def expectedPairs(docs: Seq[DocSig]): Set[(Long, Long, Int)] = {
    // independent oracle: group by band key, pair within buckets
    val buckets = docs.flatMap(d =>
      StreamingMinHash.bandKeys(d.sig).map(_ -> d)).groupBy(_._1)
    buckets.values.flatMap { members =>
      val ds = members.map(_._2).distinctBy(_.doc_id).sortBy(_.doc_id)
      for {
        i <- ds.indices; j <- (i + 1) until ds.size
        m = ds(i).sig.zip(ds(j).sig).count { case (a, b) => a == b }
      } yield (ds(i).doc_id, ds(j).doc_id, m)
    }.toSet
  }

  test("live band-state dedup across a batch boundary finds exactly the " +
    "LSH bucket pairs, with full-signature match estimates") {
    import spark.implicits._
    val docs = signatures()
    assert(docs.length > 100, "corpus signatures must exist")
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocSig]
    val q = StreamingMinHash.candidates(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("mh_live").start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val live = spark.sql("SELECT DISTINCT doc_a, doc_b, matches FROM mh_live")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = expectedPairs(docs.toSeq)
    assert(expected.nonEmpty, "testdata must produce LSH collisions")
    assert(live == expected,
      "streaming bucket state must find exactly the batch LSH pairs")
    // sharing a band means those 4 positions agree
    assert(live.forall(_._3 >= 4))
    // every band bucket must be under the admission cap here, so the
    // uncapped oracle above is exact
    val maxBucket = docs.flatMap(d => StreamingMinHash.bandKeys(d.sig))
      .groupBy(identity).values.map(_.size).max
    assert(maxBucket < StreamingMinHash.MaxBand,
      "corpus bucket exceeds the cap — oracle would diverge")
  }

  test("the admission cap bounds a degenerate bucket: identical " +
    "signatures stop pairing at the cap") {
    import spark.implicits._
    val cap = StreamingMinHash.MaxBand.toInt
    val n = cap + 50
    // identical signature -> all 4 bands collide for every doc;
    // emitted pairs = C(cap, 2), never C(n, 2)
    val sig = (1L to 16L).toSeq
    val docs = (0L until n.toLong).map(DocSig(_, sig))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocSig]
    val q = StreamingMinHash.candidates(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("mh_cap").start()
    try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    val pairs = spark.sql("SELECT DISTINCT doc_a, doc_b FROM mh_cap").count()
    val expect = cap.toLong * (cap - 1) / 2
    assert(pairs == expect,
      s"expected C($cap,2)=$expect capped pairs, got $pairs")
  }

  test("candidate pairs estimate the similarity the batch verifier confirms") {
    // every batch-confirmed near-dup pair (exact Jaccard >= 0.5) must
    // surface as a streaming candidate — LSH recall on planted dups
    val confirmed = graft.engine.ops.DedupOps.dedupMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = signatures()
    val cands = expectedPairs(docs.toSeq).map(p => (p._1, p._2))
    assert(confirmed.subsetOf(cands),
      s"verified pairs missing from candidates: ${confirmed -- cands}")
  }
}

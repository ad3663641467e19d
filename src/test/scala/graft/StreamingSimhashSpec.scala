package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.streaming.StreamingSimhash
import graft.engine.streaming.StreamingSimhash.DocFp

/** Streaming SimHash dedup on a LIVE stream fed the driver corpus's
  * REAL fingerprints (the same `graft_simhash` values the batch
  * operator gates differentially) across RANDOM micro-batch cuts,
  * matched against an independent in-memory banding computation —
  * plus the admission-cap work bound on a degenerate bucket. */
class StreamingSimhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def fingerprints(): Array[DocFp] =
    graft.engine.ops.DedupOps.dedupSimhash(spark, sf).collect()
      .map(r => DocFp(r.getLong(0), r.getLong(1))).sortBy(_.doc_id)

  /** Independent oracle: bucket by band key, all pairs within
    * Hamming ≤ 3 in buckets under the cap. */
  private def expectedPairs(docs: Seq[DocFp]): Set[(Long, Long, Int)] = {
    val buckets = docs.flatMap(d =>
      StreamingSimhash.bandKeys(d.simhash).map(_ -> d)).groupBy(_._1)
    buckets.values.flatMap { members =>
      val ds = members.map(_._2).distinctBy(_.doc_id).sortBy(_.doc_id)
      for {
        i <- ds.indices; j <- (i + 1) until ds.size
        h = java.lang.Long.bitCount(ds(i).simhash ^ ds(j).simhash)
        if h <= StreamingSimhash.MaxHamming
      } yield (ds(i).doc_id, ds(j).doc_id, h)
    }.toSet
  }

  test("live band-state dedup across random micro-batch cuts finds " +
    "exactly the banding pairs with exact Hamming distances") {
    import spark.implicits._
    val docs = fingerprints()
    assert(docs.length > 100, "corpus fingerprints must exist")
    // every band bucket must be under the admission cap here, so the
    // oracle (which ignores the cap) is exact
    val maxBucket = docs.flatMap(d => StreamingSimhash.bandKeys(d.simhash))
      .groupBy(identity).values.map(_.size).max
    assert(maxBucket < graft.engine.ops.DedupOps.SimhashMaxBand,
      "corpus bucket exceeds the cap — oracle would diverge")
    val rnd = new scala.util.Random(43)
    val cut1 = 1 + rnd.nextInt(docs.length - 2)
    val cut2 = cut1 + 1 + rnd.nextInt(docs.length - cut1 - 1)
    val batches = Seq(docs.slice(0, cut1), docs.slice(cut1, cut2),
      docs.slice(cut2, docs.length))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocFp]
    val q = StreamingSimhash.duplicates(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sh_live").start()
    try batches.foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
    finally q.stop()
    val live = spark.sql("SELECT DISTINCT doc_a, doc_b, hamming FROM sh_live")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = expectedPairs(docs.toSeq)
    assert(expected.nonEmpty, "testdata must produce banding pairs")
    assert(live == expected,
      s"streaming bucket state diverged: live=${live.size} expected=${expected.size}")
  }

  test("the admission cap bounds a degenerate bucket: identical " +
    "fingerprints stop pairing at the cap") {
    import spark.implicits._
    val cap = graft.engine.ops.DedupOps.SimhashMaxBand.toInt
    val n = cap + 50
    // identical fingerprint -> all 4 bands collide for every doc;
    // emitted pairs = C(cap, 2), never C(n, 2)
    val docs = (0L until n.toLong).map(DocFp(_, 0x12345678L))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocFp]
    val q = StreamingSimhash.duplicates(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sh_cap").start()
    try { input.addData(docs); q.processAllAvailable() } finally q.stop()
    val pairs = spark.sql("SELECT DISTINCT doc_a, doc_b FROM sh_cap").count()
    val expect = cap.toLong * (cap - 1) / 2
    assert(pairs == expect,
      s"expected C($cap,2)=$expect capped pairs, got $pairs")
  }
}

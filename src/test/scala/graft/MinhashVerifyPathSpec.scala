package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_minhash's exact-Jaccard verify has two plan shapes behind one
  * size gate: candidate-side broadcast below
  * `spark.graft.minhash.broadcastMaxCandidates` (the LSH-design case —
  * candidates ≪ corpus) and shuffle equi-joins on the doc keys above
  * it (candidates outgrow executor memory). The gate reads the
  * candidate count from the cutCounted materialization job, so the
  * flip is executable logic; this spec pins that BOTH paths return the
  * identical pair set by forcing the knob to 0 (every run takes the
  * shuffle path) and comparing against the default broadcast path on
  * the real sf0.001 corpus.
  */
class MinhashVerifyPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val Knob = "spark.graft.minhash.broadcastMaxCandidates"
  private val Dir = "/root/testdata/sf0.001"

  private def rows(): Set[(Long, Long, Double)] =
    graft.engine.ops.DedupOps.queries("dedup_minhash")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("the shuffle verify path returns the identical pair set as the " +
    "broadcast path") {
    val viaBroadcast = rows()
    assert(viaBroadcast.nonEmpty, "corpus must yield near-dup pairs")
    spark.conf.set(Knob, "0")
    try {
      val viaShuffle = rows()
      assert(viaShuffle == viaBroadcast,
        s"verify paths diverge: broadcast=${viaBroadcast.size} " +
          s"shuffle=${viaShuffle.size}")
    } finally spark.conf.unset(Knob)
  }
}

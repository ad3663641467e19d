package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.SimOps

/** Adversarial equivalence for [[SimOps.rrfFuse]]: the round-12
  * bounded spelling (TakeOrdered top-100 per ranking + broadcast
  * survivor rank recovery) must produce EXACTLY the rows of the naive
  * un-partitioned-window spelling it replaced. The oracle gate runs
  * one real corpus; this spec drives the shapes that break rank
  * recovery if any comparison or boundary is off by one: total tie
  * pileups, ties straddling the top-100 boundary, corpus sizes 99/
  * 100/101, and anti-correlated rankings where a top-10 row's rank in
  * the OTHER ordering is far beyond 100 (the deep global rank the
  * output must still report exactly). */
class RrfFuseSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  /** Straightforward local model of the naive spelling. */
  private def expected(rows: Seq[(Long, Long, Long)])
      : Seq[(Long, Int, Int, Long)] = {
    val rankCos = rows.sortBy { case (id, cos, _) => (-cos, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1) }.toMap
    val rankL2 = rows.sortBy { case (id, _, l2) => (l2, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1) }.toMap
    rows.map { case (id, _, _) =>
      val rc = rankCos(id)
      val rl = rankL2(id)
      val rrf = (if (rc <= 100) 1000000000000L / (60 + rc) else 0L) +
        (if (rl <= 100) 1000000000000L / (60 + rl) else 0L)
      (id, rc, rl, rrf)
    }.filter(_._4 > 0L)
      .sortBy { case (id, _, _, rrf) => (-rrf, id) }
      .take(10)
  }

  private def run(rows: Seq[(Long, Long, Long)]): Unit = {
    val df = rows.toDF("vec_id", "cos_e6", "l2_e6").repartition(7)
    val got = SimOps.rrfFuse(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == expected(rows))
  }

  test("total tie pileup: every score identical, ranks purely by id") {
    run((1L to 250L).map(id => (id, 7L, 7L)))
  }

  test("tie block straddling the top-100 boundary") {
    // ids 1..150 share the cos score (boundary cut by id inside the
    // block); l2 spreads them out
    run((1L to 150L).map(id => (id, 42L, id)))
  }

  test("corpus sizes around the top-k bound: 99, 100, 101") {
    Seq(99L, 100L, 101L).foreach { n =>
      run((1L to n).map(id => (id, id % 13, -id)))
    }
  }

  test("anti-correlated rankings: top-10 rows carry exact deep ranks " +
    "in the other ordering") {
    // best cos = worst l2: rank_l2 for the cos-top rows is ~500, far
    // past 100 — recovery must report the exact deep rank, not cap it
    val n = 500L
    val rows = (1L to n).map(id => (id, n - id, n - id))
    run(rows)
    val got = SimOps.rrfFuse(
      rows.toDF("vec_id", "cos_e6", "l2_e6").repartition(7)).collect()
    assert(got.exists(_.getInt(2) > 400),
      "a fused row must report its genuine >400 rank in the l2 ordering")
  }

  test("seeded random corpora with heavy duplicate scores and negatives") {
    val rnd = new scala.util.Random(12021)
    (0 until 3).foreach { _ =>
      val n = 150 + rnd.nextInt(300)
      run((1L to n.toLong).map(id =>
        (id, rnd.nextInt(40) - 20L, rnd.nextInt(40) - 20L)))
    }
  }
}

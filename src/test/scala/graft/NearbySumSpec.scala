package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.Relational3

/** Adversarial equivalence for [[Relational3.nearbySum]] — the
  * round-12 decomposition of win_range's value-range window into
  * distributed prefix sums. The oracle gate proves it on the real
  * corpus at three SFs; this spec drives the shapes that break the
  * decomposition if any boundary or cumulative is off by one group:
  * frame starts landing EXACTLY on another group's price (the
  * exclusive-vs-inclusive cum branch), duplicate prices (own-group
  * sums), frames covering nothing (the outer-as-of null → 0 path),
  * single-row corpora, and seeded random lattices engineered so
  * exact 5000.00 offsets and ties occur constantly.
  *
  * The local model mirrors the decomposed semantics the scaladoc
  * pins: membership by DOUBLE comparison `price >= p − 5000.0` (the
  * same arithmetic both engines' RANGE frames use), sums in exact
  * cents.
  */
class NearbySumSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  /** rows = (key, priority, cents). */
  private def expected(rows: Seq[(Long, String, Long)])
      : Seq[(Long, String, Double)] =
    rows.map { case (k, pri, c) =>
      val p = c / 100.0d
      val start = p - 5000.0d
      val sum = rows.collect {
        case (_, pri2, c2) if pri2 == pri &&
          c2 / 100.0d >= start && c2 / 100.0d <= p => c2
      }.sum
      (k, pri, sum / 100.0d)
    }.sortBy(_._1)

  private def run(rows: Seq[(Long, String, Long)]): Unit = {
    val df = rows.map { case (k, pri, c) => (k, pri, c / 100.0d) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .repartition(5)
    val got = Relational3.nearbySum(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == expected(rows))
  }

  test("frame start exactly on another group's price: the exclusive-" +
    "cum branch (2500.00 lattice, every other frame start collides)") {
    // prices 0, 2500, 5000, 7500, 10000 — p−5000 hits a group exactly
    // for every row from 5000 up
    run((0L to 8L).map(i => (i, "P", i * 250000L)))
  }

  test("duplicate prices: own-group sum counts every tied row once") {
    run(Seq(
      (1L, "P", 100000L), (2L, "P", 100000L), (3L, "P", 100000L),
      (4L, "P", 600000L), (5L, "P", 600000L),
      (6L, "P", 350000L)))
  }

  test("gaps wider than the frame: as-of finds nothing below the " +
    "start (outer null → 0 exclusion) or a group far below it") {
    run(Seq(
      (1L, "P", 0L), (2L, "P", 2000000L), (3L, "P", 5000000L),
      (4L, "P", 5200000L)))
  }

  test("corpus sizes 1 and 2, boundary-exact pair") {
    run(Seq((1L, "P", 123456L)))
    // exactly 5000.00 apart: the higher row's frame includes both
    run(Seq((1L, "P", 100000L), (2L, "P", 600000L)))
  }

  test("priorities never leak: identical price lattice in two " +
    "priorities, sums stay per-priority") {
    val one = (0L to 6L).map(i => (i, "A", i * 250000L))
    val two = (10L to 16L).map(i => (i, "B", (i - 10) * 250000L))
    run(one ++ two)
  }

  test("seeded random lattice: ties and exact 5000.00 offsets by " +
    "construction, 3 priorities, 400 rows") {
    val rnd = new scala.util.Random(20260814L)
    val basis = Array(0L, 123456L, 250000L, 370001L, 500000L, 741300L)
    val rows = (1L to 400L).map { k =>
      val pri = "PRI" + rnd.nextInt(3)
      // half the rows sit on basis values, half on basis + exact
      // 5000.00 multiples — so frame starts constantly collide with
      // group prices and duplicate prices are common
      val c = basis(rnd.nextInt(basis.length)) +
        500000L * rnd.nextInt(3)
      (k, pri, c)
    }
    run(rows)
  }
}

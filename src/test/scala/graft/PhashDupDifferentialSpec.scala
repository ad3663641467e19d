package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.multimodal.Multimodal

/** Independent verification of `mm_phash_dup`'s LSH banding (round-16
  * advice): since round 15 the DuckDB oracle transliterates the
  * banding + hot-band cap, so the differential gate would mirror a bug
  * in the cap instead of catching it. This spec keeps the ORIGINAL
  * uncapped all-pairs semantics as a second, independent oracle at a
  * SF where the cap provably never fires — the banding logic itself
  * (4 × 16-bit bands, pigeonhole at Hamming ≤ 3, verify, dedup) is
  * checked against brute force, not against its own spelling — and
  * pins the cap's recall contract on synthetic phashes where the cap
  * DOES fire, including the dropped-band count surfaced through
  * [[graft.engine.Provenance]]. */
class PhashDupDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  test("banded pairs equal uncapped all-pairs Hamming<=3 at sf0.01 " +
    "(cap never fires there — asserted, not assumed)") {
    val sf = "/root/testdata/sf0.01"
    val ph = Multimodal.phashFrame(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ph.length > 100, "testdata sanity")
    // brute force over C(N,2): the committed-oracle semantics BEFORE
    // the round-15 cap — every pair, exact Hamming, threshold 3
    val expect = (for {
      i <- ph.indices.iterator
      j <- (i + 1) until ph.length
      a = ph(i); b = ph(j)
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield {
      val (x, y) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      (x, y, h.toLong)
    }).toSet
    val got = SparkEntry.queries("mm_phash_dup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // precondition that makes the equality an UNCAPPED check: at this
    // SF no band bucket exceeds PhashMaxBand, so banding loses only
    // what pigeonhole proves it cannot lose
    assert(graft.engine.Provenance.get("mm_phash_dup", "dropped_hot_bands")
      .contains(0L), "cap must not fire at sf0.01 for this differential")
    assert(got == expect,
      s"banded != all-pairs: only-banded=${(got -- expect).take(3)} " +
        s"only-brute=${(expect -- got).take(3)}")
    assert(got.nonEmpty, "vacuous differential — no near-dup pairs at all")
  }

  test("hot-band cap drops only-hot-band pairs, keeps pairs sharing a " +
    "sane band, and surfaces the dropped count in Provenance") {
    val s = spark
    import s.implicits._
    // every id shares band0 = 42 (the hot bucket); all other band
    // values are chosen disjoint across rows EXCEPT:
    //  - ids 1,2: share sane bands band2=7 and band3=0, Hamming 1
    //    -> must SURVIVE the cap (pair also agrees on a sane band)
    //  - ids 3,4: Hamming 3 but agree ONLY on the hot band
    //    -> a true near-dup the cap knowingly drops
    //  - filler ids 20..: one-bit-apart id pairs are Hamming 3 and
    //    agree only on the hot band -> also dropped
    val nFill = (Multimodal.PhashMaxBand - 1).toInt // 4 + 499 = 503 > cap
    val special = Seq(
      (1L, 42L, 7L), // band1=0, band2=7,  band3=0
      (2L, 42L | (1L << 16), 7L), // band1=1, band2=7,  band3=0
      (3L, 42L | (4L << 16), 8L | (16L << 16)), // band1=4, b2=8, b3=16
      (4L, 42L | (5L << 16), 9L | (17L << 16))) // band1=5, b2=9, b3=17
    val fillers = (20 until 20 + nFill).map { id =>
      (id.toLong, 42L | (id.toLong << 16),
        id.toLong | (id.toLong << 16)) // band1=band2=band3=id
    }
    val rows = special ++ fillers
    val ph = rows.toDF("media_id", "phash_lo", "phash_hi")
    val got = Multimodal.phashDupPairs(s, ph, "phash_dup_capped_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graft.engine.Provenance
      .get("phash_dup_capped_test", "dropped_hot_bands").contains(1L),
      "exactly the one hot (band, value) bucket must be dropped")
    assert(got == Set((1L, 2L)),
      s"cap recall contract violated: $got")
    // the uncapped all-pairs truth CONTAINS pairs the cap drops —
    // (3,4) by construction — so the set difference is exactly the
    // documented recall loss: pairs whose only agreement is degenerate
    val uncapped = (for {
      i <- rows.indices.iterator; j <- (i + 1) until rows.length
      a = rows(i); b = rows(j)
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (a._1, b._1)).toSet
    assert(uncapped.contains((3L, 4L)), "synthetic frame sanity")
    assert(uncapped.contains((1L, 2L)))
    assert((uncapped -- got).forall { case (x, y) =>
      // every dropped pair agrees on NO sane band: bands 1..3 differ
      val a = rows.find(_._1 == x).get; val b = rows.find(_._1 == y).get
      def bandsOf(t: (Long, Long, Long)) = Seq(
        (t._2 >> 16) & 0xffffL, t._3 & 0xffffL, (t._3 >> 16) & 0xffffL)
      bandsOf(a).zip(bandsOf(b)).forall { case (u, v) => u != v }
    }, "a dropped pair shared a sane band — cap dropped too much")
  }
}

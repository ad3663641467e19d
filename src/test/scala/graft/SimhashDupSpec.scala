package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.DedupOps

/** `dedup_simhash_dup` against a driver-side brute force: on a corpus
  * where no band bucket exceeds the cap, the 4×8-bit banding must find
  * EXACTLY the all-pairs Hamming ≤ 3 set (the pigeonhole losslessness
  * claim, proven by equality rather than argued); and on a degenerate
  * all-identical corpus the band cap must drop the oversized buckets.
  */
class SimhashDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
      .repartition(8).write.parquet(s"$dir/documents.parquet")
  }

  private def toks(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector

  private def polyHash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i); i += Character.charCount(cp)
      h = (h * 31 + cp) % 1000000007L
    }
    h
  }

  /** Driver twin of graft_simhash (same constants, same votes). */
  private def simHash(th: Seq[Long]): Long = {
    val A = Array(7L, 13, 31, 43, 59, 61, 73, 97, 101, 127, 131, 151, 163, 181, 197, 199)
    val B = Array(3L, 17, 29, 41, 53, 71, 89, 103, 113, 139, 149, 167, 179, 191, 211, 223)
    (0 until 32).foldLeft(0L) { (res, j) =>
      val votes = th.map(x => if (((x * A(j % 16) + B((j * 3 + j / 16) % 16))
        % 1000000007L) * 2 >= 1000000007L) 1L else -1L).sum
      if (votes >= 0) res | (1L << j) else res
    }
  }

  private def fingerprint(text: String): Option[Long] = {
    val t = toks(text).distinct
    if (t.isEmpty) None else Some(simHash(t.map(polyHash)))
  }

  test("banding finds exactly the brute-force Hamming<=3 pair set when " +
    "no bucket exceeds the cap") {
    val dir = tmpDir("simdup")
    val rnd = new scala.util.Random(23)
    val vocab = Vector.tabulate(400)(i => s"w${i}x${(i * 37) % 101}")
    def doc(n: Int): String =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 150L).map(i => i -> doc(12 + rnd.nextInt(25)))
    // planted near-identical docs: drop one word from a base doc —
    // fingerprints land within a few bits
    val planted = (0 until 25).map { j =>
      val (_, src) = base(j * 5)
      (150L + j) -> src.split(' ').drop(1).mkString(" ")
    }
    val docs = base ++ planted
    writeDocs(dir, docs)

    val fps = docs.flatMap { case (id, t) => fingerprint(t).map(id -> _) }
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).sortBy(p => (p._3, p._1, p._2)).take(1000)

    val out = DedupOps.dedupSimhashDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == brute,
      s"banding diverged from brute force: got ${out.size}, expected ${brute.size}")
    assert(brute.nonEmpty, "test corpus produced no near-dup pairs — not probative")
  }

  test("the band cap drops degenerate buckets: an all-identical corpus " +
    "yields zero pairs instead of C(n,2), with measured linear shuffle") {
    val dir = tmpDir("simdup-hot")
    val n = (DedupOps.SimhashMaxBand + 200).toInt
    writeDocs(dir, (0L until n.toLong).map(i =>
      i -> "the same boilerplate sentence appears in every document here"))
    val df = DedupOps.dedupSimhashDup(spark, dir)
    val stats = graft.engine.Metrics.shuffleStats(df)
    assert(df.count() == 0L)
    // work bound, not just output bound: every shuffle row is a
    // (doc, band) posting or a band count — never a pair. C(700,2)
    // would be 244k pairs; 10 rows/doc of slack covers the posting
    // explosion, band-count aggregates and retries.
    assert(stats.recordsWritten < 10L * n,
      s"degenerate corpus shuffled ${stats.recordsWritten} records " +
        s"(quadratic pair generation escaped the cap?)")
  }
}

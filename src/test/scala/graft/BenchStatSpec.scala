package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rev-5 headline statistic, pinned: lower median of the clean set
  * (steady passes within 1.5× of the steady minimum). Both the bench
  * headline and tools/drift.py's recomputation depend on this exact
  * definition — a drift between them would silently break the "one
  * statistic" property the rev-3→4 transition was about. */
class BenchStatSpec extends AnyFunSuite {
  private def stat(xs: Double*) = Bench.lowerMedianOfClean(xs)

  test("two agreeing steady passes report their min (rev-4 continuity)") {
    // the quiet-host case MUST equal rev 4's min(pass2, pass3), or
    // every cross-round comparison at the rev seam misreads
    assert(stat(1.0, 1.2) == 1.0)
    assert(stat(1.2, 1.0) == 1.0)
    // boundary: exactly 1.5x is still clean; lower median of 2 = min
    assert(stat(1.0, 1.5) == 1.0)
  }

  test("a contended pass is dropped, not averaged in") {
    // the round-12 driver shape: [4.17, 12.74] published 4.17 under
    // min(); under rev 5 the 12.74 is excluded and the min survives
    assert(stat(4.17, 12.74) == 4.17)
    // with extra passes, the median lands on a real clean measurement
    assert(stat(12.74, 4.17, 4.3, 4.1) == 4.17)
  }

  test("the reported value is always an actual measured pass") {
    for (xs <- Seq(Seq(1.0, 1.2), Seq(5.0, 1.0, 1.1, 0.9),
                   Seq(2.0), Seq(3.0, 3.0, 3.0)))
      assert(xs.contains(Bench.lowerMedianOfClean(xs)),
        s"statistic over $xs invented a number")
  }

  test("majority-noise runs still report from the quiet passes") {
    // 3 of 4 steady passes inflated: clean = [1.0]; report 1.0 — the
    // mechanism that stops contention from masking OR faking drift
    assert(stat(9.0, 1.0, 8.0, 7.5) == 1.0)
  }

  test("odd clean sets take the true middle") {
    assert(stat(1.0, 1.1, 1.2) == 1.1)
    assert(stat(1.2, 1.0, 9.9, 1.1) == 1.1)
  }

  test("rev-7 deferral gate: defer on a >2x-median control window, " +
    "never without a stable baseline, never on uniform slowness") {
    val quiet = Seq(0.17, 0.18, 0.16, 0.17, 0.19)
    // the r15 shapes: stream_state's control read 2.0s against a 0.169
    // median (11.8x) — must defer; stream_sliding's 1.11s (6.6x) too
    assert(Bench.shouldDefer(2.001, quiet))
    assert(Bench.shouldDefer(1.111, quiet))
    // normal jitter stays
    assert(!Bench.shouldDefer(0.25, quiet))
    assert(!Bench.shouldDefer(0.34, quiet)) // exactly 2x median is NOT above
    // fewer than 5 priors: no stable median, never defer (the first
    // queries of a sweep must not gate on 1-2 samples)
    assert(!Bench.shouldDefer(5.0, Seq(0.17, 0.18)))
    assert(!Bench.shouldDefer(5.0, Nil))
    // a uniformly slow host shifts the median — that is host speed,
    // not a window; nothing defers and the control series records it
    val slow = Seq(1.7, 1.8, 1.6, 1.7, 1.9)
    assert(!Bench.shouldDefer(2.0, slow))
    // the median is over ALL priors, so one early spike cannot poison
    // the baseline
    assert(Bench.shouldDefer(2.0, Seq(0.17, 5.0, 0.18, 0.17, 0.19)))
  }

  test("rev-8 absolute baseline resolves the prior round's ctl_med " +
    "from the committed artifacts") {
    // tests run from the repo root, where the driver's BENCH_r{N}.json
    // artifacts live; the resolver must find the highest-numbered one
    // and read a positive control median out of either shape (trimmed
    // stdout line: "ctl_med" field; full artifact: "control" series)
    val got = Bench.prevCtlMed()
    assert(got.isDefined, "no BENCH_r*.json resolved from the repo root")
    val (src, med) = got.get
    assert(src.matches("BENCH_r\\d+\\.json"), s"unexpected source $src")
    assert(med > 0.0 && med < 60.0, s"implausible control median $med")
    // highest GIT-COMMITTED round wins (r18): the current round's
    // artifact sits untracked in the working tree while the bench
    // runs, and using it as its own baseline would pin
    // host_slow_vs_prev at ~1.0 — exactly the masking the field
    // exists to prevent. So the resolver must match the max over
    // `git ls-files`, never the bare directory max (which may be one
    // round ahead mid-round).
    val n = "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(src).get.group(1).toInt
    import scala.sys.process._
    val committed = Seq("git", "ls-files", "BENCH_r*.json").!!.linesIterator
      .flatMap("^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).toSeq
    assert(committed.nonEmpty && committed.max == n,
      s"resolved round $n but committed artifacts go up to ${committed.max}")
    val dirMax = new java.io.File(".").listFiles.map(_.getName)
      .flatMap("^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).max
    assert(n <= dirMax, s"resolved $n beyond directory max $dirMax")
  }

  test("rev-9 settle classification: heavy rows converge on the last two " +
    "passes; light rows and never-converging series stay rev-5") {
    // the r17 sf10 dedup_clusters shape: steady [4.62, 33.09, 12.44,
    // 5.76] never has two consecutive agreeing passes -> not settled.
    // Under rev 10's 4.0s threshold (r18 advice) the series IS
    // settle-ELIGIBLE (min 4.62 >= 4.0, so the sweep keeps taking
    // passes and, failing convergence, flags it `unsettled`) — under
    // rev 9's 5.0 it wasn't, and the policy's own motivating series
    // silently reverted to the rev-5 lottery with no provenance
    assert(Bench.settledDiscards(Seq(4.62, 33.09, 12.44, 5.76)).isEmpty)
    // same wild series, one converging pass appended -> settled now
    // that its 4.62s floor clears the rev-10 threshold
    assert(Bench.settledDiscards(Seq(4.62, 33.09, 12.44, 5.76, 5.2))
      .contains(3))
    // floor in [4.0, 5.0): heavy under rev 10 (was light under rev 9)
    assert(Bench.settledDiscards(Seq(4.2, 4.3)).contains(0))
    // floor under 4.0: still light — sf0.1 rows (heaviest ~2.5s)
    // never engage the settle machinery, rev 9<->10 compare directly
    assert(Bench.settledDiscards(Seq(3.9, 3.9)).isEmpty)
    // same shape lifted above the threshold, one more pass converging:
    // last two [5.76, 5.5] agree within 1.2x -> settled, 3 discarded
    assert(Bench.settledDiscards(Seq(11.0, 33.0, 12.4, 5.76, 5.5))
      .contains(3))
    // heavy and immediately quiet -> settled with 0 discards; the
    // published min(last two) equals the rev-5 lower-median-of-clean,
    // so rev 8<->9 artifacts compare directly on quiet series
    assert(Bench.settledDiscards(Seq(6.0, 6.5)).contains(0))
    assert(Bench.lowerMedianOfClean(Seq(6.0, 6.5)) == 6.0)
    // light rows NEVER engage settle regardless of convergence
    assert(Bench.settledDiscards(Seq(2.0, 2.1)).isEmpty)
    // heavy but the last two disagree by >1.2x -> unsettled (rev-5)
    assert(Bench.settledDiscards(Seq(10.0, 20.0)).isEmpty)
    // single steady pass: no pair to converge on
    assert(Bench.settledDiscards(Seq(9.0)).isEmpty)
  }

  test("re-run triggers: steady disagreement OR every steady pass far " +
    "above the warm-up") {
    // original rev-5 trigger: intra-steady spread
    assert(Bench.needsRerun(warm = 5.0, steady = Seq(1.0, 2.0)))
    assert(!Bench.needsRerun(warm = 5.0, steady = Seq(1.0, 1.4)))
    // cold-anomaly (the graph_triangles [2.05, 14.6, 10.6] shape:
    // spread 1.38 never fired, yet both steady passes measured JVM
    // state, not the plan — the warm-up pass bounds the plan's cost
    // from above, compile time included)
    assert(Bench.needsRerun(warm = 2.05, steady = Seq(14.6, 10.6)))
    // normal shape: warm-up slower than steady (one-time builds) — and
    // a failed warm-up (recorded 0.0) must never divide the trigger
    assert(!Bench.needsRerun(warm = 6.0, steady = Seq(2.0, 2.2)))
    assert(!Bench.needsRerun(warm = 0.0, steady = Seq(2.0, 2.2)))
    // a recovered extra pass rescues the reported number through the
    // existing clean-set filter: the fresh 2.2 becomes the steady min
    // and both inflated passes drop as outliers
    assert(stat(14.6, 10.6, 2.2) == 2.2)
  }
}

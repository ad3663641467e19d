#!/usr/bin/env python3
"""Per-query drift between two bench_out.json artifacts, on the SAME
statistic as the headline: lower median of the clean steady passes
(rev 5; reduces to min(runs[1:]) on rev-3/4 artifacts), falling back
to the reported per-query time when runs are absent.

Round-11 lesson: the drift table was computed on min-of-all-runs while
the headline was min(pass2, pass3), so a 3.8x headline jump (ts_acf)
coexisted with an "empty" drift table. One statistic, used for both,
or the table lies.

Usage: drift.py OLD.json NEW.json [threshold]
"""
import json
import sys


def headline(d):
    """Recompute the headline statistic from raw runs: lower median of
    the clean set (steady passes within 1.5x of the steady min) —
    mirrors Bench.lowerMedianOfClean (rev 5) exactly. On a rev-3/4
    artifact's exactly-2 steady passes this REDUCES to min(runs[1:])
    (the lower median of 2 clean passes is their min; a dirty pass
    leaves a 1-element clean set, also the min), so one statistic
    covers every rev>=3 artifact without a cross-rev seam.
    """
    runs = d.get("runs", {})
    out = {}
    for q, t in d["queries"].items():
        rs = runs.get(q)
        if not rs or len(rs) < 2:
            out[q] = t
        else:
            steady = rs[1:]
            clean = sorted(r for r in steady if r <= min(steady) * 1.5)
            out[q] = clean[(len(clean) - 1) // 2]
    return out


def load(path):
    d = json.load(open(path))
    # the driver's BENCH_r{N}.json wraps the builder artifact it parsed
    # from stdout under "parsed" — unwrap so committed round artifacts
    # compare directly against a local bench_out.json
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return d


def main():
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    if old.get("sf") != new.get("sf"):
        print(f"WARNING: sf differs ({old.get('sf')} vs {new.get('sf')})")
    ro, rn = old.get("bench_rev", 0), new.get("bench_rev", 0)
    if min(ro, rn) < 3:
        # a rev<=2 artifact's runs are best-of-2 with no warm-up
        # discard — a different statistic headline() cannot reconcile
        sys.exit(f"REFUSING: bench_rev {ro} vs {rn} — rev<=2 artifacts "
                 f"(best-of-2, no warm-up discard) cannot be reconciled "
                 f"with rev>=3 runs; compare same-rev artifacts")
    if ro != rn:
        # rev 3/4 whole-inventory sweeps carry code-cache churn that
        # rev>=4 per-query passes don't — the statistic reconciles,
        # the MEASUREMENT CONDITIONS may not
        print(f"WARNING: bench_rev differs ({ro} vs {rn}) — statistic "
              f"reconciled from raw runs, but rev-3 sweep-order JVM "
              f"inflation (if present) is a measurement-condition "
              f"difference; treat drift rows as indicative")
    ho, hn = headline(old), headline(new)
    rows = []
    for q in sorted(set(ho) & set(hn)):
        o, n = ho[q], hn[q]
        if o > 0.05 and n > o * thresh and n - o > 0.2:
            rows.append((q, o, n, n / o))
    print(f"statistic: lower-median-of-clean(runs[1:]) | "
          f"threshold {thresh}x (+0.2s floor) | "
          f"{len(set(ho) & set(hn))} shared queries")
    print(f"totals (same statistic): {sum(ho.values()):.1f}s -> "
          f"{sum(hn.values()):.1f}s")
    if not rows:
        print("drift table EMPTY - zero queries grew")
    for q, o, n, r in sorted(rows, key=lambda x: -x[3]):
        print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    improved = [(q, ho[q], hn[q]) for q in set(ho) & set(hn)
                if hn[q] < ho[q] / thresh and ho[q] - hn[q] > 0.2]
    if improved:
        print("improved >1.5x:")
        for q, o, n in sorted(improved, key=lambda x: x[2] - x[1])[:15]:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s")

    # shuffle-record drift: unlike wall time, shuffle volume is
    # deterministic per plan+data, so ANY change here is a plan change
    # — the regression signal host noise can neither fake nor hide.
    # (Field present from round 13; silently absent on older artifacts.)
    so, sn = old.get("shuffle_records"), new.get("shuffle_records")
    if so and sn:
        shared = sorted(set(so) & set(sn))
        moved = [(q, so[q], sn[q]) for q in shared
                 if sn[q] != so[q] and max(so[q], sn[q]) > 1000
                 and (so[q] == 0 or sn[q] / max(so[q], 1) > 1.1
                      or sn[q] / max(so[q], 1) < 0.9)]
        print(f"shuffle-record drift (>10% and >1000 records, "
              f"{len(shared)} shared queries):")
        if not moved:
            print("  EMPTY - no plan moved its shuffle volume")
        for q, o, n in sorted(moved, key=lambda x: -abs(x[2] - x[1]))[:20]:
            print(f"  {q}: {o} -> {n} records")
    elif sn and not so:
        print("shuffle-record drift: old artifact predates the field; "
              "baseline established this round")

    # fat-shuffle-row tripwire: a multi-KB AVERAGE shuffle record is
    # the signature of a whole-dataset aggregation buffer riding one
    # row (agg_percentile shipped a 4 MB single-record buffer until
    # round 13 — the shape that OOMs one executor at corpus scale).
    # Static property of the NEW artifact, not a drift: surface is
    # clean as of round 13, so any appearance here is a regression.
    sb = new.get("shuffle_bytes")
    if sn and sb:
        fat = [(sb[q] / sn[q], q, sn[q], sb[q]) for q in sn
               if sn[q] > 0 and sb[q] / sn[q] > 64 * 1024]
        if fat:
            print("FAT SHUFFLE ROWS (avg record > 64 KiB — single-row "
                  "aggregate buffer?):")
            for a, q, r, b in sorted(fat, reverse=True):
                print(f"  {q}: {a / 1024:.0f} KiB/record "
                      f"({r} records, {b} bytes)")


if __name__ == "__main__":
    main()

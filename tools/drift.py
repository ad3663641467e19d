#!/usr/bin/env python3
"""Per-query drift between two bench_out.json artifacts, on the SAME
statistic as the headline: min of the non-warm-up passes (runs[1:]),
falling back to the reported per-query time when runs are absent.

Round-11 lesson: the drift table was computed on min-of-all-runs while
the headline was min(pass2, pass3), so a 3.8x headline jump (ts_acf)
coexisted with an "empty" drift table. One statistic, used for both,
or the table lies.

Usage: drift.py OLD.json NEW.json [threshold]
"""
import json
import sys


def headline(d):
    runs = d.get("runs", {})
    out = {}
    for q, t in d["queries"].items():
        rs = runs.get(q)
        out[q] = min(rs[1:]) if rs and len(rs) > 1 else t
    return out


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    if old.get("sf") != new.get("sf"):
        print(f"WARNING: sf differs ({old.get('sf')} vs {new.get('sf')})")
    ho, hn = headline(old), headline(new)
    rows = []
    for q in sorted(set(ho) & set(hn)):
        o, n = ho[q], hn[q]
        if o > 0.05 and n > o * thresh and n - o > 0.2:
            rows.append((q, o, n, n / o))
    print(f"statistic: min(runs[1:]) | threshold {thresh}x (+0.2s floor) | "
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


if __name__ == "__main__":
    main()

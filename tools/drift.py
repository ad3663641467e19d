#!/usr/bin/env python3
"""Per-query drift between two bench_out.json artifacts, on the SAME
statistic as the headline: lower median of the clean steady passes
(rev 5; reduces to min(runs[1:]) on rev-3/4 artifacts), falling back
to the reported per-query time when runs are absent.

Round-11 lesson: the drift table was computed on min-of-all-runs while
the headline was min(pass2, pass3), so a 3.8x headline jump (ts_acf)
coexisted with an "empty" drift table. One statistic, used for both,
or the table lies.

Rev-6 artifacts additionally carry a "control" series: a fixed-work,
data-independent query timed right before each query's passes. When
BOTH artifacts have it, every drift row is also shown CONTROL-ADJUSTED
(new time divided by the local host-speed ratio) and classified
HOST vs PLAN -- the exact method the round-14 judge used by hand to
show graph_jaccard's published 2.07s -> 4.71s was a 1.3x-slower host,
not a plan change. Control values are smoothed with a +-2-query
median in execution (sorted-name) order before the ratio, so one
noisy control pass cannot flip a classification.

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

    Rev-9 artifacts publish SETTLED heavy rows (every steady pass
    >= the settle threshold — 5s at rev 9, 4s from rev 10 — last two
    within 1.2x) as min(last two); mirror that here so
    the drift table and the headline stay one statistic on rev>=9
    artifacts too. The classification is recomputed from runs, same as
    tools/bench_validate.py enforces.
    """
    runs = d.get("runs", {})
    rev = d.get("bench_rev", 0)
    settle_secs = 4.0 if rev >= 10 else 5.0
    out = {}
    for q, t in d["queries"].items():
        rs = runs.get(q)
        if not rs or len(rs) < 2:
            out[q] = t
        else:
            steady = rs[1:]
            l2 = steady[-2:]
            if (rev >= 9 and min(steady) >= settle_secs and len(l2) == 2
                    and max(l2) / min(l2) <= 1.2 + 1e-9):
                out[q] = min(l2)
            else:
                clean = sorted(r for r in steady if r <= min(steady) * 1.5)
                out[q] = clean[(len(clean) - 1) // 2]
    return out


def smoothed_control(d):
    """Per-query control time, median-smoothed over a +-2 window in
    execution order (queries run in sorted-name order, so neighbors in
    that order ran within seconds of each other). {} when the artifact
    predates rev 6. Rev-7 deferred/re-run rows did NOT run adjacent to
    their name-order neighbors, so their control is used raw — their
    artifact control was re-measured immediately before the passes
    that were actually published."""
    ctl = d.get("control") or {}
    if not ctl:
        return {}
    # rev-10 isolated rows ran in their own child JVMs, not adjacent
    # to name-order neighbors — same no-smoothing treatment as
    # deferred rows
    moved = (set(d.get("deferred") or []) | set(d.get("host_degraded") or [])
             | set(d.get("isolation") or {}))
    names = sorted(ctl)
    out = {}
    for i, q in enumerate(names):
        if q in moved:
            out[q] = ctl[q]
            continue
        win = [ctl[names[j]] for j in range(max(0, i - 2),
                                            min(len(names), i + 3))
               if names[j] not in moved or j == i]
        win.sort()
        out[q] = win[len(win) // 2]
    return out


def host_factors(old, new):
    """(per-query new/old host-speed factor, global median factor), or
    ({}, None) when either artifact lacks a control series. Clipped to
    [0.25, 4]: a factor outside that is not host speed, it is a broken
    control measurement. A per-query factor more than 2x away from the
    session-median factor is REPLACED by the median (round 16): true
    cross-round host speed is a session property, so a wild per-query
    factor means one side's control sat in a degraded window — and
    dividing by it fabricates drift (r15's sf1 artifact carried a
    degraded graph_* control window; the raw-improved pagerank row
    ctl-adjusted to a phantom 2x PLAN regression until this fix)."""
    co, cn = smoothed_control(old), smoothed_control(new)
    shared = set(co) & set(cn)
    if not shared:
        return {}, None
    f = {q: min(4.0, max(0.25, cn[q] / co[q])) for q in shared if co[q] > 0}
    med = sorted(f.values())[len(f) // 2] if f else None
    if med:
        f = {q: v if med / 2 <= v <= med * 2 else med for q, v in f.items()}
    return f, med


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
    if ro != rn and not (min(ro, rn) >= 5):
        # rev 3/4 whole-inventory sweeps carry code-cache churn that
        # rev>=4 per-query passes don't — the statistic reconciles,
        # the MEASUREMENT CONDITIONS may not. (rev 5/6/7 are mutually
        # exempt: rev 6 only ADDS the control series and rev 7 only
        # moves WHEN a degraded query runs; the per-query statistic is
        # identical across all three.)
        print(f"WARNING: bench_rev differs ({ro} vs {rn}) — statistic "
              f"reconciled from raw runs, but rev-3 sweep-order JVM "
              f"inflation (if present) is a measurement-condition "
              f"difference; treat drift rows as indicative")
    ho, hn = headline(old), headline(new)
    factors, med_factor = host_factors(old, new)

    def adj(q, n):
        """Control-adjusted new time: divide out the local host-speed
        ratio (per-query factor, global median as fallback)."""
        f = factors.get(q, med_factor)
        return n / f if f else n

    # row selection on max(raw, ctl-adjusted): a plan regression on a
    # FASTER new host (control factor < 1) keeps its raw ratio under
    # threshold — selecting on raw alone would mask it (round-16 fix).
    # Classification below stays ctl-adjusted as before.
    rows = []
    for q in sorted(set(ho) & set(hn)):
        o, n = ho[q], hn[q]
        if o <= 0.05:
            continue
        na = adj(q, n)
        raw_hit = n > o * thresh and n - o > 0.2
        adj_hit = na > o * thresh and na - o > 0.2
        if raw_hit or adj_hit:
            rows.append((q, o, n, n / o, na))

    # deterministic per-query shuffle stability — the sub-second
    # tiebreaker (round-16, verdict item 3): wall-time drift with
    # IDENTICAL shuffle volume on a sub-second row is noise no control
    # pass happened to witness, not a plan change
    so_all = old.get("shuffle_records") or {}
    sn_all = new.get("shuffle_records") or {}

    def shuffle_stable(q):
        """True = volume unchanged (within the drift section's own
        10%/1000-record insignificance bounds), False = moved,
        None = not measured in both artifacts."""
        if q not in so_all or q not in sn_all:
            return None
        a, b = so_all[q], sn_all[q]
        if a == b or max(a, b) <= 1000:
            return True
        if a == 0:
            return False
        return 0.9 <= b / a <= 1.1

    degraded_new = set(new.get("host_degraded") or [])
    print(f"statistic: lower-median-of-clean(runs[1:]) | "
          f"threshold {thresh}x (+0.2s floor) on max(raw, ctl-adjusted) | "
          f"{len(set(ho) & set(hn))} shared queries")
    print(f"totals (same statistic): {sum(ho.values()):.1f}s -> "
          f"{sum(hn.values()):.1f}s")
    if med_factor is not None:
        print(f"host-speed factor (fixed-work control, new/old): "
              f"median {med_factor:.2f}x over {len(factors)} queries")
    else:
        print("no shared control series (pre-rev-6 artifact?) - drift "
              "rows are raw, host vs plan not classified")
    # rev-10 second control family: the shuffle probe sees page-cache/
    # IO state the in-memory scan probe is blind to — print both
    # factors side by side when available so a sweep that is "fast by
    # scan probe, slow by shuffle probe" is visible in one line
    c2o, c2n = old.get("ctl2_med"), new.get("ctl2_med")
    if c2o and c2n:
        print(f"shuffle-probe factor (control2, new/old): "
              f"{c2n / c2o:.2f}x (medians {c2o:.3f}s -> {c2n:.3f}s)")
    # rev-8 absolute baseline: the NEW artifact self-reports its
    # session ctl_med against the prior committed round's — the
    # in-data flag for a UNIFORMLY degraded session, which the
    # relative in-run gate cannot see (its own median shifts with the
    # degradation) and which the factor above only catches when OLD is
    # the same artifact the session compared itself against.
    hsp = new.get("host_slow_vs_prev")
    if hsp is not None:
        src = new.get("ctl_prev_src", "?")
        print(f"new artifact self-reports host_slow_vs_prev {hsp:.2f}x "
              f"(vs {src})" +
              (" — UNIFORMLY DEGRADED SESSION, treat raw times "
               "accordingly" if hsp > 1.5 else ""))
    if not rows:
        print("drift table EMPTY - zero queries grew")
    n_host = 0
    for q, o, n, r, na in sorted(rows, key=lambda x: -x[3]):
        if med_factor is None:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
            continue
        # a row still past the threshold AFTER dividing out measured
        # host speed is a plan/code regression; otherwise the control
        # slowed down with it and the host is the cause. Sub-second
        # rows whose shuffle volume is UNCHANGED get the explicit
        # HOST-NOISE class (the r15->r16 residual: stream_session
        # 0.42 -> 0.67 s, ctl normal, shuffle drift empty — resolved
        # by hand then, automatic now).
        is_plan = na > o * thresh and na - o > 0.2
        if q in degraded_new:
            # the NEW artifact itself says this row published from a
            # degraded window after exhausting its deferral retries —
            # believe it over the smoothed factor (rev 7)
            tag = "HOST (flagged host_degraded in new artifact)"
            is_plan = False
        elif is_plan and max(o, na) < 1.0 and shuffle_stable(q) is True:
            tag = "HOST-NOISE (sub-second, shuffle-stable)"
            is_plan = False
        else:
            tag = "PLAN" if is_plan else "HOST"
        n_host += 0 if is_plan else 1
        print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x raw, "
              f"{na / o:.2f}x ctl-adj, host {factors.get(q, med_factor):.2f}x)"
              f" -> {tag}")
    if rows and med_factor is not None:
        print(f"  ({n_host}/{len(rows)} drift rows explained by host "
              f"speed/noise)")
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

#!/usr/bin/env python3
"""Spec-style validation of a rev-7..10 bench artifact (round-16
verdict item 1; round-17 rev-8 fields; round-18 rev-9 settle policy:
heavy rows — every steady pass >= the settle threshold — publish min
of the converged last-two passes, with the settled/unsettled
provenance recomputed structurally from runs and cross-checked;
round-19 rev 10: settle threshold 5.0 -> 4.0, optional per-row JVM
isolation ("isolation" map), sparse second control family
("control2"/"ctl2_med")). Asserts the invariants the in-run
control gate is supposed to enforce, so a violated artifact fails
loudly instead of being misread:

 1. PUBLISHED-CONTROL invariant: every query NOT listed under
    "host_degraded" has control <= 2x the session median of published
    controls (the exact number a reader would compute from the
    artifact alone). Rows that exhausted their deferral retries are
    allowed above the line ONLY because they are flagged.
 2. Shape invariants: queries/runs/control/spread key sets agree;
    failed is disjoint from queries; value == sum(queries) (1e-6);
    every published time is a real member of its clean steady set
    (the rev-5 statistic, recomputed).
 3. deferred/host_degraded name the published inventory only.
    Rev 7: host_degraded ⊆ deferred. Rev 8: host_degraded ⊆
    deferred ∪ flagged_unreran, flagged_unreran ⊆ host_degraded, and
    flagged_unreran ∩ deferred = ∅ (a flagged-without-late-re-run row
    is by definition not a deferred one).
 4. Rev-8 self-consistency: "ctl_med" equals the recomputed median of
    the control series (mean-of-middles convention), and
    "host_slow_vs_prev" equals ctl_med / ctl_prev_med when present.

TRIMMED artifacts (the driver's budgeted stdout line: an "elided"
count, slowest-N queries only, ctl_med/min/max summaries instead of
the per-query control series) are detected by the "elided" key and get
the checks that remain meaningful: value >= sum(shown queries),
n == len(shown) + elided, failed disjoint, rev-8 ratio consistency.
A trimmed artifact can no longer fail the validator merely for being
trimmed (round-16 verdict item 3) — it is validated AS a trimmed
artifact, with the weaker contract that shape can support printed.

Usage: bench_validate.py ARTIFACT.json   (bench_out.json or a
committed BENCH_r{N}.json — driver wrappers are unwrapped)
Exit 0 = all invariants hold; 1 = violations (printed).

NOT part of the shipped library — dev tool only.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return d


def lower_median_of_clean(steady):
    clean = sorted(t for t in steady if t <= min(steady) * 1.5)
    return clean[(len(clean) - 1) // 2]


def mid_median(vs):
    """Mean-of-middles median — the ctl_med convention (stdout line
    since rev 7, full artifact since rev 8)."""
    s = sorted(vs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def validate_trimmed(d, label):
    """The budgeted driver-stdout shape: slowest-N queries + 'elided'
    count + ctl summaries. Check what that shape can support."""
    errs = []
    q = d.get("queries") or {}
    failed = d.get("failed") or []
    n, elided = d.get("n"), d.get("elided", 0)
    if n is not None and n != len(q) + elided and not failed:
        # failed rows are excluded from queries but counted nowhere
        # else in the trimmed line, so only the failed-free case is an
        # exact identity
        errs.append(f"trimmed shape: n={n} != shown {len(q)} + "
                    f"elided {elided}")
    total = sum(q.values())
    if total > d.get("value", total) + 5e-3 * max(1, len(q)):
        errs.append(f"trimmed shape: shown queries sum {total:.3f} "
                    f"exceeds value {d.get('value')}")
    for name in failed:
        if name in q:
            errs.append(f"trimmed shape: {name} both failed and published")
    errs += check_prev_ratio(d)
    if errs:
        print(f"{label}: {len(errs)} violation(s) [trimmed artifact]")
        for e in errs:
            print(f"  FAIL {e}")
    else:
        print(f"{label}: OK [trimmed artifact — {len(q)} shown + "
              f"{elided} elided; control-gate invariant needs the full "
              f"artifact (bench_out.json / BENCH_local_r{{N}}.json)]")
    return errs


def check_prev_ratio(d):
    """Rev-8 absolute-baseline self-consistency (full AND trimmed)."""
    errs = []
    hsp = d.get("host_slow_vs_prev")
    med, prev = d.get("ctl_med"), d.get("ctl_prev_med")
    if hsp is not None and med is not None and prev:
        if abs(hsp - med / prev) > 5e-3:
            errs.append(f"rev8: host_slow_vs_prev {hsp} != ctl_med "
                        f"{med} / ctl_prev_med {prev} = {med / prev:.3f}")
    if hsp is not None and hsp > 1.5:
        print(f"  NOTE host_slow_vs_prev = {hsp}: this whole session "
              f"ran >=1.5x slower than the prior round's host — treat "
              f"every raw time accordingly")
    return errs


def validate(d, label):
    if "elided" in d:
        return validate_trimmed(d, label)
    errs = []
    q = d.get("queries") or {}
    ctl = d.get("control") or {}
    runs = d.get("runs") or {}
    spread = d.get("spread") or {}
    failed = d.get("failed") or []
    deferred = set(d.get("deferred") or [])
    degraded = set(d.get("host_degraded") or [])
    flagged = set(d.get("flagged_unreran") or [])
    rev = d.get("bench_rev", 0)

    if rev < 7:
        print(f"{label}: bench_rev {rev} < 7 — control-gate invariant "
              f"not applicable; checking shape only")

    iso = d.get("isolation") or {}

    # 1. published-control invariant (rev >= 7). Rev-10 isolated rows
    # are exempt: their control is a fresh child-JVM sample merged
    # into the parent's series — the deferral machinery (and thus the
    # "was flagged or re-ran late" invariant) never saw them, and a
    # 1-row child session has no median to gate against.
    if rev >= 7 and ctl:
        vs = sorted(ctl.values())
        med = vs[(len(vs) - 1) // 2]
        for name, c in sorted(ctl.items()):
            if c > 2.0 * med and name not in degraded and name not in iso:
                errs.append(
                    f"control invariant: {name} published with control "
                    f"{c:.3f}s > 2x session median {med:.3f}s and is NOT "
                    f"flagged host_degraded")

    # 2. shape
    for name in q:
        if name not in runs:
            errs.append(f"shape: {name} has no runs entry")
        if ctl and name not in ctl:
            errs.append(f"shape: {name} has no control entry")
        if spread and name not in spread:
            errs.append(f"shape: {name} has no spread entry")
    for name in failed:
        if name in q:
            errs.append(f"shape: {name} is both failed and published")
    total = sum(q.values())
    # "queries" values are %.4f-rounded in the artifact while "value"
    # is the unrounded sum — allow half-ulp per query of rounding slack
    if abs(total - d.get("value", total)) > 5e-5 * max(1, len(q)) + 1e-6:
        errs.append(f"shape: value {d.get('value')} != sum(queries) "
                    f"{total:.4f}")
    # Per-query statistic. Rev 9 adds the SETTLE policy for heavy rows
    # (every steady pass >= SETTLE_SECS): such a row keeps taking
    # passes until the last two agree within SETTLE_AGREE and then
    # publishes min(last two); the classification is STRUCTURAL (fully
    # recomputable from runs), so the artifact's settled/unsettled
    # lists must match what the runs themselves say — a flag that
    # disagrees with the data is a violation, not a preference.
    settled = d.get("settled") or {}
    unsettled = set(d.get("unsettled") or [])
    # rev 10 lowers the settle threshold to 4.0 (r18 advice: the
    # policy's motivating series had a 4.62s floor and was ineligible
    # at 5.0)
    SETTLE_SECS = 4.0 if rev >= 10 else 5.0
    SETTLE_AGREE = 1.2
    # Boundary tolerance (r18 advice): the artifact's runs are
    # %.4f-rounded while the in-run classification uses exact doubles
    # against hard thresholds, so a row sitting ON a boundary (floor
    # at the settle threshold, or last-two ratio at the agree bound)
    # can legitimately classify differently here than it did in-run.
    # Such rows are validated against EVERY rounding-consistent
    # interpretation instead of one recomputed verdict.
    EPS_T = 1e-4  # half-ulp of the 4-decimal run values
    EPS_R = 1e-3  # ratio slack: 1e-4 on both >=4s passes
    for name in set(settled) & unsettled:
        errs.append(f"rev9: {name} both settled and unsettled")
    for name, t in q.items():
        rs = runs.get(name)
        if not rs or len(rs) < 2:
            continue
        st = rs[1:]
        l2 = st[-2:]
        heavy_hi = min(st) >= SETTLE_SECS - EPS_T  # possibly heavy in-run
        heavy_lo = min(st) >= SETTLE_SECS + EPS_T  # definitely heavy
        ratio = max(l2) / min(l2) if len(l2) == 2 else None
        conv_hi = ratio is not None and ratio <= SETTLE_AGREE + EPS_R
        conv_lo = ratio is not None and ratio <= SETTLE_AGREE - EPS_R
        heavies = {heavy_hi} if heavy_hi == heavy_lo else {True, False}
        convs = {conv_hi} if conv_hi == conv_lo else {True, False}
        # (claim, published-value) pairs consistent with the rounded runs
        ok_interps = set()
        for h in heavies:
            for c in convs:
                if rev >= 9 and h and c:
                    ok_interps.add(("settled", min(l2)))
                elif rev >= 9 and h:
                    ok_interps.add(("unsettled", lower_median_of_clean(st)))
                else:
                    ok_interps.add(("light", lower_median_of_clean(st)))
        claim = ("settled" if name in settled
                 else "unsettled" if name in unsettled else "light")
        matches = [(c, w) for (c, w) in ok_interps
                   if c == claim and abs(t - w) <= 1e-6]
        if not matches:
            errs.append(
                f"statistic: {name} published {t} as '{claim}' but the "
                f"rev-{max(rev, 5)} recomputation admits only "
                f"{sorted(ok_interps)}")
            continue
        if claim == "settled":
            if settled[name] != len(st) - 2:
                errs.append(f"rev9: {name} settled discard count "
                            f"{settled[name]} != {len(st) - 2} from runs")
            if name in spread and ratio is not None \
                    and abs(spread[name] - ratio) > 6e-3:
                errs.append(f"rev9: {name} spread {spread[name]} != "
                            f"converged-tail ratio {ratio:.2f}")

    # 3. deferral provenance. Rev 8 splits "flagged without a late
    # re-run" out of deferred (the rev-7 overload broke drift.py's
    # window-smoothing exemption semantics): host_degraded ⊆
    # deferred ∪ flagged_unreran, flagged ⊆ degraded, flagged ∩
    # deferred = ∅. Rev-7 artifacts have no flagged list, so the
    # check degenerates to the old host_degraded ⊆ deferred there.
    for name in deferred | degraded | flagged:
        if name not in q and name not in failed:
            errs.append(f"provenance: {name} deferred/degraded/flagged "
                        f"but not in the published inventory")
    for name in degraded - deferred - flagged:
        errs.append(f"provenance: {name} host_degraded without being "
                    f"deferred or flagged_unreran first")
    for name in flagged - degraded:
        errs.append(f"provenance: {name} flagged_unreran but not "
                    f"host_degraded")
    for name in flagged & deferred:
        errs.append(f"provenance: {name} both flagged_unreran and "
                    f"deferred — the buckets are disjoint by definition")
    for name in d.get("runs_prior") or {}:
        if name not in deferred:
            errs.append(f"provenance: {name} has runs_prior but was "
                        f"never deferred/re-run")

    # 4. rev-8 self-consistency
    if ctl and d.get("ctl_med") is not None:
        want = mid_median(ctl.values())
        if abs(d["ctl_med"] - want) > 5e-4:
            errs.append(f"rev8: ctl_med {d['ctl_med']} != recomputed "
                        f"median of control series {want:.4f}")
    errs += check_prev_ratio(d)

    # 5. rev-10 fields. isolation: names must be published (or failed)
    # rows, kind must be a known one. control2: sparse second-family
    # series — ctl2_med must recompute, every key must name an
    # inventory row (it is keyed by the slot's query name).
    for name, kind in sorted(iso.items()):
        if name not in q and name not in failed:
            errs.append(f"rev10: isolation names {name} which is neither "
                        f"published nor failed")
        if kind != "jvm":
            errs.append(f"rev10: isolation[{name}] = {kind!r} is not a "
                        f"known isolation kind")
    ctl2 = d.get("control2") or {}
    for name in ctl2:
        if name not in q and name not in failed and name not in deferred:
            errs.append(f"rev10: control2 sample keyed to unknown row "
                        f"{name}")
    if ctl2 and d.get("ctl2_med") is not None:
        want = mid_median(ctl2.values())
        if abs(d["ctl2_med"] - want) > 5e-4:
            errs.append(f"rev10: ctl2_med {d['ctl2_med']} != recomputed "
                        f"median of control2 series {want:.4f}")

    if errs:
        print(f"{label}: {len(errs)} violation(s)")
        for e in errs:
            print(f"  FAIL {e}")
    else:
        n_note = (f", {len(deferred)} deferred, {len(degraded)} degraded"
                  if deferred or degraded else "")
        print(f"{label}: OK — {len(q)} queries{n_note}")
    return errs


def main():
    d = load(sys.argv[1])
    errs = validate(d, "primary")
    sec = d.get("secondary")
    if isinstance(sec, dict):
        errs += validate(sec, "secondary")
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()

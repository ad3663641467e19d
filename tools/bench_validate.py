#!/usr/bin/env python3
"""Spec-style validation of a rev-7 bench artifact (round-16 verdict
item 1). Asserts the invariants the rev-7 in-run control gate is
supposed to enforce, so a violated artifact fails loudly instead of
being misread:

 1. PUBLISHED-CONTROL invariant: every query NOT listed under
    "host_degraded" has control <= 2x the session median of published
    controls (the exact number a reader would compute from the
    artifact alone). Rows that exhausted their deferral retries are
    allowed above the line ONLY because they are flagged.
 2. Shape invariants: queries/runs/control/spread key sets agree;
    failed is disjoint from queries; value == sum(queries) (1e-6);
    every published time is a real member of its clean steady set
    (the rev-5 statistic, recomputed).
 3. deferred/host_degraded name the published inventory only, and
    host_degraded is a subset of deferred (a row can only publish
    degraded after deferral retries) — except rows flagged by the
    final audit wave, which are deferred too by construction.

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


def validate(d, label):
    errs = []
    q = d.get("queries") or {}
    ctl = d.get("control") or {}
    runs = d.get("runs") or {}
    spread = d.get("spread") or {}
    failed = d.get("failed") or []
    deferred = set(d.get("deferred") or [])
    degraded = set(d.get("host_degraded") or [])
    rev = d.get("bench_rev", 0)

    if rev < 7:
        print(f"{label}: bench_rev {rev} < 7 — control-gate invariant "
              f"not applicable; checking shape only")

    # 1. published-control invariant (rev >= 7)
    if rev >= 7 and ctl:
        vs = sorted(ctl.values())
        med = vs[(len(vs) - 1) // 2]
        for name, c in sorted(ctl.items()):
            if c > 2.0 * med and name not in degraded:
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
    for name, t in q.items():
        rs = runs.get(name)
        if rs and len(rs) >= 2:
            want = lower_median_of_clean(rs[1:])
            if abs(t - want) > 1e-6:
                errs.append(
                    f"statistic: {name} published {t} but "
                    f"lower-median-of-clean(runs[1:]) = {want}")

    # 3. deferral provenance
    for name in deferred | degraded:
        if name not in q and name not in failed:
            errs.append(f"provenance: {name} deferred/degraded but not "
                        f"in the published inventory")
    for name in degraded - deferred:
        errs.append(f"provenance: {name} host_degraded without being "
                    f"deferred first")
    for name in d.get("runs_prior") or {}:
        if name not in deferred:
            errs.append(f"provenance: {name} has runs_prior but was "
                        f"never deferred/re-run")

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

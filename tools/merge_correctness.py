#!/usr/bin/env python3
"""Merge sharded tools/check.py JSON artifacts into one round artifact.

Large-SF oracle passes are SHARDED (several check.py processes, each
with --only=<subset> --threads/--memlimit so the shards share the box;
round-18 added those knobs for exactly this). Each shard writes its own
--json artifact; this tool unions them back into the single-file shape
the round artifacts use (same keys as a monolithic check.py run), so
CORRECTNESS_sf*_r{N}.json is structurally identical whether it came
from one process or six.

Refuses to merge shards from different sf_dirs, and refuses duplicate
query names across shards (a shard-spec bug — the union must be a
partition). Timeout budgets may differ per shard (a heavy row can get
a larger documented budget); the merged artifact records the per-shard
budgets under `oracle_timeout_budget_sec` keyed by shard file when they
differ, or the common scalar when they agree.

Usage: merge_correctness.py OUT.json SHARD1.json SHARD2.json ...
       [--method="free-text provenance note"]
"""
import json
import sys


def main(out_path, shard_paths, method=None):
    merged = {"sf_dir": None, "n_pass": 0, "n_fail": 0, "n_no_oracle": 0,
              "n_bounded_pass": 0, "oracle_sec": {}, "queries": {}}
    budgets = {}
    timeouts = {}
    n_timeout = 0
    for p in shard_paths:
        s = json.load(open(p))
        if merged["sf_dir"] is None:
            merged["sf_dir"] = s["sf_dir"]
        elif merged["sf_dir"] != s["sf_dir"]:
            raise SystemExit(f"sf_dir mismatch: {merged['sf_dir']} vs "
                             f"{s['sf_dir']} in {p}")
        dup = set(merged["queries"]) & set(s["queries"])
        if dup:
            raise SystemExit(f"duplicate queries across shards: {sorted(dup)}"
                             f" (second copy in {p})")
        for k in ("n_pass", "n_fail", "n_no_oracle", "n_bounded_pass"):
            merged[k] += s.get(k, 0)
        merged["oracle_sec"].update(s.get("oracle_sec", {}))
        merged["queries"].update(s["queries"])
        if "oracle_timeout_budget_sec" in s:
            budgets[p] = s["oracle_timeout_budget_sec"]
            n_timeout += s.get("n_oracle_timeout", 0)
            timeouts.update(s.get("oracle_timeout_sec", {}))
    merged["oracle_sec"] = dict(sorted(merged["oracle_sec"].items()))
    merged["queries"] = dict(sorted(merged["queries"].items()))
    if budgets:
        vals = set(budgets.values())
        merged["oracle_timeout_budget_sec"] = (
            vals.pop() if len(vals) == 1 else budgets)
        merged["n_oracle_timeout"] = n_timeout
        merged["oracle_timeout_sec"] = dict(sorted(timeouts.items()))
    if method:
        merged["method"] = method
    json.dump(merged, open(out_path, "w"), indent=1)
    print(f"merged {len(shard_paths)} shards -> {out_path}: "
          f"{merged['n_pass']} pass, {merged['n_fail']} fail, "
          f"{merged['n_bounded_pass']} bounded, "
          f"{merged['n_no_oracle']} no-oracle, {n_timeout} timeout, "
          f"{len(merged['queries'])} rows")


if __name__ == "__main__":
    method = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--method="):
            method = a.split("=", 1)[1]
        else:
            args.append(a)
    main(args[0], args[1:], method)

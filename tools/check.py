#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]
           [--timeout=SECS] [--only=name1,name2]

Reads each <outDir>/<name> parquet (Spark output of SparkEntry.queries),
runs the matching SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares schema (sorted column names), row
count, and values (columns sorted by name, exact compare; floats also
reported with max-abs-diff so near-misses are visible).

With a 3rd positional arg, additionally writes a CORRECTNESS-style JSON
artifact (per-query {rows, pass/no_oracle/fail, msg}) — used for the
scaled-SF verification passes (round 15+), whose results are committed.

--timeout=SECS (round 17): per-oracle DuckDB budget for large-SF
passes, enforced with con.interrupt() from a timer thread. A query
whose ORACLE exceeds the budget reports status "oracle_timeout" (its
own bucket + "oracle_timeout_sec" in the artifact, NOT a fail and NOT
a pass): the r16 verdict's sf2 instruction is "time every oracle,
check every one that completes, document the remainder" — the timeout
IS the per-oracle timing record for the infeasible remainder. Engine
results are unaffected (Spark already wrote its parquet; only the
DuckDB side is budgeted). --only=... restricts to named queries (e.g.
a long-budget second pass over the first pass's timeouts).

NOT part of the shipped library — dev tool only (driver-side python).
"""
import sys, json, glob, os, time, threading
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, json_out=None, timeout=None, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_noracle = n_timeout = 0
    report = {}
    timings = {}
    timeouts = {}
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"NO-ORACLE {name}: rows={len(got)}")
            report[name] = {"rows": len(got), "status": "no_oracle"}
            n_noracle += 1
            continue
        t0 = time.time()
        timer = None
        if timeout:
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
        try:
            exp = con.execute(oracle[name]).fetchdf()
            timings[name] = round(time.time() - t0, 1)
        except duckdb.InterruptException:
            el = round(time.time() - t0, 1)
            print(f"ORACLE-TIMEOUT {name}: oracle exceeded {timeout}s "
                  f"budget (engine rows={len(got)})", flush=True)
            report[name] = {"rows": len(got), "status": "oracle_timeout",
                            "msg": f"oracle exceeded {timeout}s budget"}
            timeouts[name] = el
            n_timeout += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            report[name] = {"rows": len(got), "status": "fail",
                            "msg": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS {name}: rows={len(got)}", flush=True)
            report[name] = {"rows": len(got), "status": "pass"}
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            report[name] = {"rows": len(got), "status": "fail", "msg": msg}
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle"
          + (f", {n_timeout} oracle-timeout (budget {timeout}s)"
             if n_timeout else ""))
    if json_out:
        out = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "n_no_oracle": n_noracle,
               "oracle_sec": dict(sorted(timings.items())),
               "queries": report}
        if timeout:
            out["oracle_timeout_budget_sec"] = timeout
            out["n_oracle_timeout"] = n_timeout
            out["oracle_timeout_sec"] = dict(sorted(timeouts.items()))
        json.dump(out, open(json_out, "w"), indent=1)
    return 1 if n_fail else 0

def compare(got, exp):
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"columns differ: spark={gc} duckdb={ec}"
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} duckdb={len(exp)}"
    got, exp = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
    for c in gc:
        g, e = got[c], exp[c]
        # normalize timestamps to ns for compare
        if str(g.dtype).startswith("datetime") or str(e.dtype).startswith("datetime"):
            g = pd.to_datetime(g).astype("datetime64[us]")
            e = pd.to_datetime(e).astype("datetime64[us]")
        gn, en = g.isna(), e.isna()
        if not gn.equals(en):
            return False, f"col {c}: null pattern differs"
        g, e = g[~gn], e[~gn]
        # The driver's hash is dtype-kind-sensitive: an int column on one
        # side vs float on the other (e.g. DuckDB HUGEINT from an uncast
        # integer SUM -> pandas float64) hash-mismatches even when every
        # value is numerically equal. Mirror that strictness here.
        g_int = np.issubdtype(g.dtype, np.integer)
        e_int = np.issubdtype(e.dtype, np.integer)
        g_flt = np.issubdtype(g.dtype, np.floating)
        e_flt = np.issubdtype(e.dtype, np.floating)
        if (g_int and e_flt) or (g_flt and e_int):
            return False, (f"col {c}: dtype kind differs: spark={g.dtype} "
                           f"duckdb={e.dtype} (uncast HUGEINT sum in oracle?)")
        if g_flt or e_flt:
            ga, ea = g.astype(float).values, e.astype(float).values
            if not np.array_equal(ga, ea):
                d = np.nanmax(np.abs(ga - ea)) if len(ga) else 0
                i = int(np.nanargmax(np.abs(ga - ea)))
                return False, (f"col {c}: float mismatch max|diff|={d:.3e} "
                               f"at row {i}: spark={ga[i]!r} duckdb={ea[i]!r}")
        else:
            if not g.astype(object).equals(e.astype(object)):
                neq = (g.astype(object) != e.astype(object))
                i = int(np.argmax(neq.values))
                return False, (f"col {c}: value mismatch at row {i}: "
                               f"spark={g.iloc[i]!r} duckdb={e.iloc[i]!r}")
    return True, ""

if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    t_o = next((float(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--timeout=")), None)
    only = next((set(a.split("=", 1)[1].split(",")) for a in sys.argv[1:]
                 if a.startswith("--only=")), None)
    sys.exit(main(pos[0], pos[1], pos[2] if len(pos) > 2 else None,
                  timeout=t_o, only=only))

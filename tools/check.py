#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <outDir>/<name> parquet (Spark output of SparkEntry.queries),
runs the matching SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares schema (sorted column names), row
count, and values (columns sorted by name, exact compare; floats also
reported with max-abs-diff so near-misses are visible).

With a 3rd arg, additionally writes a CORRECTNESS-style JSON artifact
(per-query {rows, pass/no_oracle/fail, msg}) — used for the scaled-SF
verification passes (round 15+), whose results are committed.

NOT part of the shipped library — dev tool only (driver-side python).
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    n_pass = n_fail = n_noracle = 0
    report = {}
    timings = {}
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"NO-ORACLE {name}: rows={len(got)}")
            report[name] = {"rows": len(got), "status": "no_oracle"}
            n_noracle += 1
            continue
        t0 = time.time()
        try:
            exp = con.execute(oracle[name]).fetchdf()
            timings[name] = round(time.time() - t0, 1)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            report[name] = {"rows": len(got), "status": "fail",
                            "msg": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS {name}: rows={len(got)}")
            report[name] = {"rows": len(got), "status": "pass"}
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            report[name] = {"rows": len(got), "status": "fail", "msg": msg}
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    if json_out:
        json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "n_no_oracle": n_noracle,
                   "oracle_sec": dict(sorted(timings.items())),
                   "queries": report},
                  open(json_out, "w"), indent=1)
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

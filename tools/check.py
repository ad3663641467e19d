#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]
           [--timeout=SECS] [--only=name1,name2] [--staged]
           [--threads=N] [--memlimit=GiB]

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

--staged (round 18): execute the STAGED oracles (see the registry
below) via their algebraically-identical staged/substituted forms
instead of the committed text verbatim; each such pass is recorded
with an explicit "oracle" provenance field. --prove-staged: instead of
checking engine output, prove committed-vs-staged frame equality on
the given (small) SF and exit 0/1 — the license for using --staged at
SFs where the committed forms are infeasible.

NOT part of the shipped library — dev tool only (driver-side python).
"""
import sys, json, glob, os, time, threading
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Bounded differential gates (round 18, verdict item 2): queries that are
# approximate BY CONTRACT (no hash oracle possible) but whose estimate has
# a published error bound we can check quantitatively. For each, run the
# exact DuckDB SQL and assert |est - exact| / exact <= rel_err. The bound
# for agg_approx_distinct is 3 sigma of Spark's HLL++ default rsd = 0.05
# (approx_count_distinct's documented relativeSD), i.e. 0.15 — a 99.7%
# interval, pinned identically in HllRegSpec. Status: "bounded_pass" /
# "fail" (NOT "pass": the artifact keeps approximate rows distinguishable
# from hash-exact rows).
BOUNDED = {
    "agg_approx_distinct": {
        "exact_sql": "SELECT count(DISTINCT l_partkey) AS approx_parts "
                     "FROM lineitem",
        "rel_err": 0.15,
    },
}

# ---------------------------------------------------------------------------
# Staged oracles (round 18, verdict item 1): the committed SQL for three
# dedup rows is correct but has a DuckDB cost pathology at 20x that the
# r17 pass documented as >3600s. Each entry here is an ALGEBRAICALLY
# IDENTICAL execution of the committed semantics, and --prove-staged
# verifies frame-equality committed-vs-staged on small SFs before any
# scaled artifact uses --staged. Results from a staged run are recorded
# with an explicit "oracle" provenance field, never as a bare pass.
#
# dedup_near — the committed spelling is an all-pairs theta-join with a
# per-pair list_intersect (C(100k,2) candidate checks at sf2; measured
# >8h). The substitute is the classic posting-list (inverted-index)
# spelling, used and proven at sf1 in r15/r16: jaccard >= 0.5 > 0
# implies a shared shingle, so joining the exploded distinct-shingle
# postings on the shingle and counting hits per (doc_a, doc_b) yields
# exactly len(list_intersect(a.sh, b.sh)) for every pair the committed
# query can emit (sh is list_distinct, so count(*) = set-intersection
# size); pairs with no shared shingle have jaccard 0 and are emitted by
# neither spelling. Same length-band predicate, same jaccard expression
# and rounding, same output columns and ordering. Runs in ~19s at sf2.
NEAR_POSTING_SQL = """
WITH sized AS (
  SELECT doc_id, len(sh) AS n, sh FROM (
    SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents)
    WHERE len(toks) >= 3)
  WHERE len(sh) > 0),
 posts AS (SELECT doc_id, n, unnest(sh) AS s FROM sized),
 inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix,
         any_value(a.n) AS na, any_value(b.n) AS nb
  FROM posts a JOIN posts b
    ON a.s = b.s AND a.doc_id < b.doc_id
    AND least(a.n, b.n) >= 0.5 * greatest(a.n, b.n)
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  round(CAST(ix AS DOUBLE) / (na + nb - ix), 4) AS jaccard
FROM inter
WHERE round(CAST(ix AS DOUBLE) / (na + nb - ix), 4) >= 0.5
ORDER BY doc_a, doc_b"""

# dedup_clusters / dedup_clusters_star — the committed spelling ends in a
# recursive connected-components CTE over the `pairs` CTE; DuckDB
# re-evaluates the full un-materialized CTE chain (per-char minhash of
# 100k docs -> LSH banding -> verify) under the recursion, so the
# closure multiplies the ~860s pair-generation cost by the component
# diameter. The staged execution materializes the committed `pairs` CTE
# once (bit-for-bit the committed prefix text), then runs the committed
# closure text over the snapshot. A CTE is a named subquery over
# deterministic inputs, so snapshotting it cannot change the result.
STAGED = {
    "dedup_near": {"kind": "substitute", "sql": NEAR_POSTING_SQL,
                   "note": "posting-list spelling (equivalent; proven "
                           "frame-equal by --prove-staged)"},
    "dedup_clusters": {"kind": "materialize_pairs",
                       "note": "pairs CTE materialized before the "
                               "recursive closure (equivalent; proven "
                               "frame-equal by --prove-staged)"},
    "dedup_clusters_star": {"kind": "materialize_pairs",
                            "note": "pairs CTE materialized before the "
                                    "recursive closure (equivalent; proven "
                                    "frame-equal by --prove-staged)"},
    # sim_knn_graph / dedup_embed — the committed monolithic WITH-chain
    # makes DuckDB at sf10 materialize the 356M-row candidate stage WITH
    # 64-dim vector payloads attached (>69 GB spill regardless of
    # memory_limit; measured ENOSPC at limits 15/90/100 GB). Snapshotting
    # the committed `n` and `cands` CTEs as temp tables first restores
    # the sane join order (hash builds on the 200k-row `n`, candidates
    # stream) — the identical tail then runs in ~1 min with zero spill.
    # Pure CTE snapshotting over deterministic inputs, same argument as
    # materialize_pairs; proven frame-equal by --prove-staged.
    "sim_knn_graph": {"kind": "stage_vec",
                      "note": "n + cands CTEs materialized before the "
                              "scoring stage (equivalent; proven "
                              "frame-equal by --prove-staged)"},
    "dedup_embed": {"kind": "stage_vec",
                    "note": "n + cands CTEs materialized before the "
                            "scoring stage (equivalent; proven "
                            "frame-equal by --prove-staged)"},
}


def run_staged(cur, name, committed_sql):
    """Execute the staged form of a STAGED oracle on `cur`; returns the
    result frame. The materialize_pairs transform is textual surgery on
    the COMMITTED sql with single-occurrence markers asserted, so it
    tracks the committed text if it ever changes (and fails loudly if
    the shape diverges rather than running something else)."""
    spec = STAGED[name]
    if spec["kind"] == "substitute":
        return cur.execute(spec["sql"]).fetchdf()
    if spec["kind"] == "stage_vec":
        # Committed shape: WITH n AS (<body>),\n cc AS (...), ...,
        # cands AS (...),\n p AS (...) ... SELECT ... — cut at the two
        # single-occurrence markers, snapshot n and cands, re-attach
        # the committed tail verbatim.
        m_cc, m_p = "\n cc AS (", "\n p AS ("
        assert committed_sql.count(m_cc) == 1, \
            f"{name}: cc marker not unique in committed SQL"
        assert committed_sql.count(m_p) == 1, \
            f"{name}: p marker not unique in committed SQL"
        head_n, rest = committed_sql.split(m_cc)
        head_n = head_n.rstrip()
        assert head_n.startswith("WITH n AS (") and head_n.endswith("),"), \
            f"{name}: committed n-prefix shape changed"
        n_body = head_n[len("WITH n AS ("):-2]
        # Performance-only pragma; every committed final SELECT carries
        # an explicit ORDER BY, which this setting never overrides.
        cur.execute("SET preserve_insertion_order=false")
        cur.execute("CREATE OR REPLACE TEMP TABLE graft_n_mat AS " + n_body)
        mid, tail = (m_cc + rest).split(m_p)
        mid = mid.rstrip()
        assert mid.endswith("),"), f"{name}: committed cands-chain shape changed"
        cur.execute("CREATE OR REPLACE TEMP TABLE graft_cands_mat AS "
                    "WITH n AS (SELECT * FROM graft_n_mat)," + mid[:-1]
                    + " SELECT vec_a, vec_b FROM cands")
        staged = ("WITH n AS (SELECT * FROM graft_n_mat), "
                  "cands AS (SELECT * FROM graft_cands_mat)," + m_p[1:]
                  + tail)
        return cur.execute(staged).fetchdf()
    marker = "\n edges AS ("
    assert committed_sql.count(marker) == 1, \
        f"{name}: staged marker not unique in committed SQL"
    head, tail = committed_sql.split(marker)
    head = head.rstrip()
    assert head.endswith("),"), f"{name}: committed prefix shape changed"
    prefix = head[:-1]  # drop the trailing comma -> a closed WITH chain
    cur.execute("CREATE OR REPLACE TEMP TABLE graft_pairs_mat AS "
                + prefix + " SELECT doc_a, doc_b FROM pairs")
    staged = ("WITH RECURSIVE pairs AS "
              "(SELECT doc_a, doc_b FROM graft_pairs_mat)," + marker[1:]
              + tail)
    return cur.execute(staged).fetchdf()

def connect(sf_dir, threads=None, memlimit=None):
    """One DuckDB connection over the SF's parquet views. threads /
    memlimit (GiB) bound a SHARDED run: large-SF passes run several
    check.py processes side by side (oracle results are per-query
    independent), and unbounded processes would each default to every
    core and 80% of RAM. A temp_directory is always set so a bounded
    process spills instead of erroring."""
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={int(threads)}")
    if memlimit:
        con.execute(f"SET memory_limit='{int(memlimit)}GB'")
    # Per-PID spill dir: concurrent shards sharing one temp_directory
    # race on DuckDB's fixed-name temp files (duckdb_temp_storage-0.tmp)
    # — one process removing the file aborts the other with IOException.
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main(sf_dir, out_dir, json_out=None, timeout=None, only=None,
         staged=False, threads=None, memlimit=None):
    con = connect(sf_dir, threads, memlimit)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    if only:
        missing = sorted(only - set(names))
        if missing:
            print(f"WARNING --only names with no engine output (skipped): "
                  f"{missing}", flush=True)
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_noracle = n_timeout = 0
    report = {}
    timings = {}
    timeouts = {}
    n_bounded = 0
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name in BOUNDED:
            ok, msg = check_bounded(con, name, got)
            if ok:
                print(f"BOUNDED-PASS {name}: {msg}", flush=True)
                report[name] = {"rows": len(got), "status": "bounded_pass",
                                "msg": msg}
                n_bounded += 1
            else:
                print(f"FAIL {name}: {msg}")
                report[name] = {"rows": len(got), "status": "fail",
                                "msg": msg}
                n_fail += 1
            continue
        if name not in oracle:
            print(f"NO-ORACLE {name}: rows={len(got)}")
            report[name] = {"rows": len(got), "status": "no_oracle"}
            n_noracle += 1
            continue
        # Per-oracle cursor (r17-advice timer-race fix): con.interrupt()
        # from the timer thread can land AFTER fetchdf() returned but
        # BEFORE timer.cancel(); on a shared connection that stale
        # interrupt aborts the NEXT oracle as a spurious timeout. A
        # fresh cursor per oracle (its own connection object, shared
        # catalog) makes a late interrupt hit only the already-finished
        # cursor. Belt-and-braces: an InterruptException with elapsed
        # clearly under the budget is classified as stale and retried
        # once instead of being recorded as oracle_timeout.
        t0 = time.time()
        exp, el, err = None, None, None
        for attempt in range(2):
            cur = con.cursor()
            timer = None
            if timeout:
                timer = threading.Timer(timeout, cur.interrupt)
                timer.start()
            t0 = time.time()
            try:
                if staged and name in STAGED:
                    exp = run_staged(cur, name, oracle[name])
                else:
                    exp = cur.execute(oracle[name]).fetchdf()
                timings[name] = round(time.time() - t0, 1)
                break
            except duckdb.InterruptException:
                el = round(time.time() - t0, 1)
                if timeout and el < timeout * 0.98 and attempt == 0:
                    print(f"STALE-INTERRUPT {name}: interrupted at {el}s "
                          f"< {timeout}s budget — retrying once", flush=True)
                    continue
                # GENUINE timeout (elapsed ~= budget): record it, never
                # fall through to a second full-budget attempt — only
                # stale interrupts retry (round-18 advice: the missing
                # break burned 2x the budget per real timeout)
                break
            except Exception as e:
                err = e
                break
            finally:
                if timer:
                    timer.cancel()
                cur.close()
        if exp is None and err is None:
            print(f"ORACLE-TIMEOUT {name}: oracle exceeded {timeout}s "
                  f"budget (engine rows={len(got)})", flush=True)
            report[name] = {"rows": len(got), "status": "oracle_timeout",
                            "msg": f"oracle exceeded {timeout}s budget"}
            timeouts[name] = el
            n_timeout += 1
            continue
        if err is not None:
            print(f"FAIL {name}: oracle SQL error: {err}")
            report[name] = {"rows": len(got), "status": "fail",
                            "msg": f"oracle SQL error: {err}"}
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS {name}: rows={len(got)}"
                  + (" [staged oracle]" if staged and name in STAGED else ""),
                  flush=True)
            report[name] = {"rows": len(got), "status": "pass"}
            if staged and name in STAGED:
                report[name]["oracle"] = "staged: " + STAGED[name]["note"]
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            report[name] = {"rows": len(got), "status": "fail", "msg": msg}
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle"
          + (f", {n_bounded} bounded-pass" if n_bounded else "")
          + (f", {n_timeout} oracle-timeout (budget {timeout}s)"
             if n_timeout else ""))
    if json_out:
        out = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "n_no_oracle": n_noracle, "n_bounded_pass": n_bounded,
               "oracle_sec": dict(sorted(timings.items())),
               "queries": report}
        if timeout:
            out["oracle_timeout_budget_sec"] = timeout
            out["n_oracle_timeout"] = n_timeout
            out["oracle_timeout_sec"] = dict(sorted(timeouts.items()))
        json.dump(out, open(json_out, "w"), indent=1)
    return 1 if n_fail else 0

def prove_staged(sf_dir, out_dir):
    """Equivalence proof for every STAGED oracle: run the COMMITTED SQL
    and the STAGED execution on the same (small) SF and require exact
    frame equality via the same compare() the gate uses. Run this at
    sf0.01 and sf0.1 (where the committed forms are feasible) before
    trusting any --staged artifact at a larger SF."""
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = 0
    for name in sorted(STAGED):
        t0 = time.time()
        committed = con.execute(oracle[name]).fetchdf()
        t1 = time.time()
        cur = con.cursor()
        stagedf = run_staged(cur, name, oracle[name])
        cur.close()
        t2 = time.time()
        ok, msg = compare(stagedf, committed)
        tag = "PROOF-PASS" if ok else "PROOF-FAIL"
        print(f"{tag} {name}: committed {t1-t0:.1f}s vs staged {t2-t1:.1f}s,"
              f" rows={len(committed)}" + ("" if ok else f" — {msg}"),
              flush=True)
        failed += 0 if ok else 1
    print(f"== staged-oracle proof: {len(STAGED) - failed} equal, "
          f"{failed} diverged on {sf_dir}")
    return 1 if failed else 0


def check_bounded(con, name, got):
    """Quantitative gate for contractually-approximate queries: the
    engine estimate must sit within BOUNDED[name].rel_err of DuckDB's
    exact answer. Returns (ok, msg); msg always carries the numbers so
    the artifact records HOW close, not just that it passed."""
    spec = BOUNDED[name]
    exact = con.execute(spec["exact_sql"]).fetchdf()
    if len(got) != len(exact):
        return False, (f"bounded gate: row count differs: "
                       f"spark={len(got)} exact={len(exact)}")
    gc = sorted(got.columns)
    if gc != sorted(exact.columns):
        return False, (f"bounded gate: columns differ: spark={gc} "
                       f"exact={sorted(exact.columns)}")
    got = got[gc].reset_index(drop=True)
    exact = exact[gc].reset_index(drop=True)
    worst = 0.0
    for c in gc:
        e = exact[c].astype(float).values
        g = got[c].astype(float).values
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.abs(g - e) / np.where(e == 0, 1, np.abs(e))
        worst = max(worst, float(np.max(rel)) if len(rel) else 0.0)
    ok = worst <= spec["rel_err"]
    return ok, (f"max rel err {worst:.4f} vs bound {spec['rel_err']} "
                f"(exact={exact.iloc[0, 0] if len(exact) == 1 else '...'}"
                f", est={got.iloc[0, 0] if len(got) == 1 else '...'})")


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
    thr = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--threads=")), None)
    mem = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--memlimit=")), None)
    if "--prove-staged" in sys.argv:
        sys.exit(prove_staged(pos[0], pos[1]))
    sys.exit(main(pos[0], pos[1], pos[2] if len(pos) > 2 else None,
                  timeout=t_o, only=only, staged="--staged" in sys.argv,
                  threads=thr, memlimit=mem))

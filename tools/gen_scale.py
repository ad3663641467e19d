#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata — dev tool (driver-side
python, like check.py; NOT part of the shipped library).

Builds an sf1-shaped dataset from /root/testdata/sf0.1 by unioning R
(default 10) key-shifted replicas of every scaling table, so the
heaviest queries can be verified and benched at 10x the largest
driver-provided SF (round-15 verdict item 2). The driver's generator is
not available in this sandbox and /root/testdata is read-only, so the
scaled data lives under the repo's target/ (never committed, rebuilt on
demand). Correctness at the scaled SF is still EXTERNALLY checked: the
DuckDB oracle (tools/check.py) runs the same oracle SQL over the same
scaled parquet, so a hash match means exactly what it means at sf0.01.

Replica construction (i = 0..R-1; replica 0 is the original rows):
  - region/nation: fixed dimensions, copied once (TPC-H semantics).
  - keyed tables: every primary/foreign key shifts by i * OFF[key],
    where OFF is the smallest power of 10 above the sf0.1 max key —
    replicas occupy disjoint key ranges and joins stay replica-local,
    so join/agg cardinalities scale linearly like a real 10x dataset.
  - documents: replica text is vowel/consonant-rotated (translate, a
    1:1 char map — n_chars stays truthful) so replicas are NOT
    near-duplicates of each other: exact-replica text would square the
    near-dup pair space (every doc gains 9 clones sharing ALL
    shingles), an artificially adversarial corpus no real 10x crawl
    looks like. Within-replica near-dup structure is preserved.
  - embeddings: replica i > 0 applies a deterministic SIGNED
    PERMUTATION (an orthogonal transform: element j of the replica is
    sign(i, j) * embedding[perm_i(j)], the same transform for every
    vector in the replica). Within each replica, every dot product,
    norm, cosine and neighborhood is EXACTLY the original corpus's —
    the similarity structure is real 10x over, not noise (round-16
    fix: hash-noise replicas made 90% of the sf1 corpus structureless,
    so similarity/recall numbers at sf1 weren't representative;
    element-level jitter was rejected because it turns every replica
    into a cos~0.99 clone of its original, multiplying the tau=0.45
    near-dup pair space ~R^2x — no real 10x crawl has 9 near-copies of
    everything). Across replicas, cosines are quasi-random (a signed
    permutation scrambles coordinates), so replicas behave like
    distinct domains and no distance ties arise; every element stays
    an EXACT original float (sign flips are exact in IEEE), so the
    DuckDB oracle sees bit-identical values.
    perm_i(j) = (a_i*j + b_i) mod d with d = the corpus embedding
    dimension (queried from the parquet, asserted a power of two so
    any odd multiplier is coprime to it — round-17 fix for the
    hardcoded mod-64), a_i = 2*(i mod d/2) + 1 (odd, hence a
    bijection), b_i = (17*i + 29*(i div d/2)) mod d. The (a_i, b_i)
    pairs are pairwise distinct for i < d^2/2: equal multipliers
    force i' = i + (d/2)*k, and then b' - b = k*(d/2 + 29) mod d
    with d/2 + 29 odd, hence coprime to the power-of-two d, hence
    nonzero until k = d. At d = 64 the family holds 2048 distinct
    permutations, so R = 100 replicas (a 100x corpus) stay
    collision-free where the round-16 form wrapped at R = 64
    (round-16 verdict item 4). For i < d/2 the new form reduces
    EXACTLY to the round-16 one (a_i = 2i+1, b_i = 17i), so every
    committed sf1/sf2/sf5 artifact (R <= 20) remains bit-reproducible
    from this generator. sign(i, j) = +-1 from hash(997*i + j).
    `gen_scale.py --selftest` verifies bijectivity and pairwise
    distinctness of the realized transforms for R = 128 at d = 64
    (plus d = 16 / 128 variants) without touching any data.

The generation stamps DST/provenance.json (source, R, key offsets,
the git rev of this repo at generation time, and this file's sha256)
so any future round can reproduce the exact corpus.

Usage: gen_scale.py [SRC] [DST] [R]
"""
import hashlib
import json
import os
import subprocess
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def affine(i, d):
    """Replica i's permutation coefficients (a, b): perm_i(j) =
    (a*j + b) mod d. See module doc for the distinctness proof
    (pairwise-distinct for i < d^2/2; reduces to the round-16 family
    for i < d/2, keeping committed artifacts reproducible)."""
    assert d >= 4 and d & (d - 1) == 0, \
        f"embedding dim {d} is not a power of two; odd-multiplier " \
        f"coprimality (and the distinctness proof) need one"
    a = 2 * (i % (d // 2)) + 1
    b = (17 * i + 29 * (i // (d // 2))) % d
    return a, b


def selftest():
    """Prove the transform family collision-free at R = 128 (past the
    round-16 R = 64 wrap) and every realized map a bijection, for the
    corpus dimension and two neighbors. Exits nonzero on failure."""
    for d in (16, 64, 128):
        r = min(128, d * d // 2)
        seen = {}
        for i in range(r):
            a, b = affine(i, d)
            perm = tuple((a * j + b) % d for j in range(d))
            assert sorted(perm) == list(range(d)), \
                f"d={d} i={i}: perm not a bijection"
            assert perm not in seen, \
                f"d={d}: replica {i} collides with replica {seen[perm]}"
            seen[perm] = i
        # round-16 compatibility: first d/2 replicas use the old form
        for i in range(d // 2):
            a, b = affine(i, d)
            assert (a, b) == (2 * i + 1, (17 * i) % d), \
                f"d={d} i={i}: not backward-compatible with round 16"
        print(f"selftest d={d}: {r} transforms distinct, all bijective, "
              f"first {d // 2} == round-16 family")
    # document translate maps: 100 pairwise-distinct 1:1 char maps,
    # first 25 byte-identical to the round-16 two-factor family
    maps = [translate_args(i) for i in range(100)]
    assert len(set(maps)) == 100, "translate maps collide below R=100"
    for src, dst in maps:
        assert sorted(src) == sorted(dst), "translate map not 1:1"
    for i in range(25):
        s_old = VOW + CON + VOW.upper() + CON.upper()
        dv, dc = rot(VOW, i % 5), rot(CON, i // 5)
        d_old = dict(zip(s_old, dv + dc + dv.upper() + dc.upper()))
        d_new = dict(zip(*maps[i]))
        assert all(d_new.get(c, c) == d_old.get(c, c)
                   for c in set(d_old) | set(d_new)), \
            f"replica {i} text map diverges from the round-16 family"
    print("selftest: 100 translate maps distinct, first 25 == round-16")
    print("selftest OK")

# smallest power of 10 above each key's sf0.1 max (see module doc)
O_CUST, O_SUPP, O_PART = 100_000, 1_000, 100_000
O_ORDER, O_EVENT, O_USER = 1_000_000, 100_000, 10_000
O_DOC, O_VEC = 10_000, 10_000

VOW, CON, CON2 = "aeiou", "bcdfg", "hjkl"


def rot(s, k):
    k %= len(s)
    return s[k:] + s[:k]


def translate_args(i):
    """1:1 char map for replica i: vowels rotate by i%5, the five most
    common consonants by (i//5)%5, and (round 17) a second consonant
    group by i//25 — 5*5*4 = 100 pairwise-distinct maps, i=0 the
    identity. The old 2-factor family held only 25 distinct maps, so a
    100x corpus (R=100) would have made replicas 0/25/50/75 EXACT text
    clones of each other — precisely the artificially-adversarial
    near-dup corpus the module doc rejects (every doc gains 3 clones
    sharing ALL shingles, squaring the candidate space). For i < 25
    the i//25 rotation is the identity, so every committed artifact
    (R <= 20) keeps byte-identical document text. R > 100 wraps and
    needs a further factor first — mirrored by selftest()."""
    src = VOW + CON + CON2 + (VOW + CON + CON2).upper()
    dv, dc = rot(VOW, i % 5), rot(CON, (i // 5) % 5)
    dc2 = rot(CON2, i // 25)
    d = dv + dc + dc2
    return src, d + d.upper()


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    n_threads = os.cpu_count() or 8
    con.execute(f"SET threads={n_threads}")

    def emit(name, select_for):
        parts = [select_for(i) for i in range(R)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def copy(name):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') "
                    f"TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        print(f"{name}: copied")

    copy("region")
    copy("nation")

    emit("customer", lambda i: f"""
      SELECT c_custkey + {i * O_CUST} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM '{SRC}/customer.parquet'""")

    emit("supplier", lambda i: f"""
      SELECT s_suppkey + {i * O_SUPP} AS s_suppkey, s_name, s_nationkey,
             s_acctbal
      FROM '{SRC}/supplier.parquet'""")

    emit("part", lambda i: f"""
      SELECT p_partkey + {i * O_PART} AS p_partkey, p_name, p_brand,
             p_type, p_size, p_retailprice
      FROM '{SRC}/part.parquet'""")

    emit("orders", lambda i: f"""
      SELECT o_orderkey + {i * O_ORDER} AS o_orderkey,
             o_custkey + {i * O_CUST} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{SRC}/orders.parquet'""")

    emit("lineitem", lambda i: f"""
      SELECT l_orderkey + {i * O_ORDER} AS l_orderkey,
             l_partkey + {i * O_PART} AS l_partkey,
             l_suppkey + {i * O_SUPP} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM '{SRC}/lineitem.parquet'""")

    emit("events", lambda i: f"""
      SELECT event_id + {i * O_EVENT} AS event_id, ts,
             user_id + {i * O_USER} AS user_id, event_type, value, props
      FROM '{SRC}/events.parquet'""")

    def docs(i):
        src, dst = translate_args(i)
        return f"""
      SELECT doc_id + {i * O_DOC} AS doc_id,
             translate(text, '{src}', '{dst}') AS text,
             lang, source, n_chars
      FROM '{SRC}/documents.parquet'"""
    emit("documents", docs)

    # modulus = the actual corpus dimension (round-17 fix: the
    # hardcoded 64 would silently NULL-pad or break bijectivity on any
    # other dim — ADVICE r16); affine() asserts it is a power of two
    dim = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]

    def embs(i):
        if i == 0:
            return f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
        # signed-permutation orthogonal transform, same for every
        # vector of replica i (see module doc): within-replica
        # geometry is exactly the original's, cross-replica cosines
        # quasi-random, every element an exact original float
        a, b = affine(i, dim)
        return f"""
      SELECT vec_id + {i * O_VEC} AS vec_id,
             CAST(list_transform(range(0, len(embedding)), j ->
               (CASE WHEN hash(997 * {i} + j) % 2 = 0 THEN 1 ELSE -1 END)
               * embedding[1 + CAST((({a} * j + {b}) % {dim})
                                    AS BIGINT)]) AS FLOAT[]) AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'"""
    emit("embeddings", embs)

    rev = subprocess.run(["git", "rev-parse", "HEAD"],
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    with open(f"{DST}/provenance.json", "w") as f:
        json.dump({
            "generator": "tools/gen_scale.py",
            "generator_sha256": hashlib.sha256(
                open(os.path.abspath(__file__), "rb").read()).hexdigest(),
            "git_rev": rev.stdout.strip() if rev.returncode == 0 else None,
            "src": SRC, "dst": DST, "replicas": R,
            "key_offsets": {"customer": O_CUST, "supplier": O_SUPP,
                            "part": O_PART, "orders": O_ORDER,
                            "events": O_EVENT, "user": O_USER,
                            "documents": O_DOC, "embeddings": O_VEC},
            "embedding_transform":
                "signed-permutation, affine family (round 17; "
                "== round-16 family for replicas < dim/2)",
            "embedding_dim": dim,
        }, f, indent=1)
    print(f"provenance: {DST}/provenance.json")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main()

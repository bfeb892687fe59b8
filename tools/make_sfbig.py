#!/usr/bin/env python3
"""Regenerate the scaling corpora (wiped between rounds).

10x recipe (docs/SCALING.md): replicate the sf0.1 driver tables 10x
with shifted keys — unique ids, same time range (10x heavier days);
`documents` replicas get a distinct leading token so each doc is a
~0.95-Jaccard near-dup of its 9 siblings (deliberately DUP-HEAVY, the
hard case for LSH). Driver-side tooling only (duckdb), like selfcheck.py.

Above DUP_REPS (10) replicas — i.e. the sf1 / 100x corpus — document
replicas get UNIQUE content instead: each replica's tokens are
re-ordered by a per-replica salted hash (deterministic), which destroys
3-gram overlap with every other replica while preserving the token
multiset (token-level stats unchanged). The result is a web-corpus-
shaped mix: the same absolute dup mass as the 10x corpus (reps 0-9)
plus 90x genuinely-new content — so near-dup OUTPUT stays fixed while
the index/candidate machinery scales 100x. A 100x all-near-dup corpus
would instead grow the true-pair OUTPUT ~110x over the 10x one and
measure result materialization, not the engine.

`embeddings` replicas (rep >= 1) are NOT verbatim copies (round-9 fix:
verbatim replication saturated every 10x/100x ANN recall cell at 1.0 —
the scaled corpus measured tie-breaking, not indexing). Each replica is
a deterministic convex interpolation toward a hash-chosen SAME-LABEL
partner: v' = a + t*(b - a), t in [0.05, 0.95]. Same-label keeps the
cluster geometry (and `label` as a valid blocking key) while every
replica is a genuinely new point — new points span many sqrt(n)-IVF
cells (nlist grows with n, labels don't), so scaled recall is a real
boundary-effects measurement. rep 0 keeps the original vectors, so the
base corpus embeds verbatim.

Usage: python3 tools/make_sfbig.py [src_dir] [out_dir] [reps]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
DUP_REPS = 10  # replicas below this stay near-dups; above get unique content

# per-table key-shift rules: (id_cols_to_shift, extra_select_rewrite)
TABLES = {
    "region": None,          # fixed dims: copy once, no replication
    "nation": None,
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, shift in TABLES.items():
        src = f"{SRC}/{t}.parquet"
        if not os.path.exists(src):
            print(f"skip {t} (no source)")
            continue
        dst = f"{OUT}/{t}.parquet"
        if os.path.isdir(dst):           # stale Spark-written directory
            shutil.rmtree(dst)
        # documents/embeddings are small-row-count but compute-dense;
        # small row groups let Spark's byte-range splitting hand them
        # to many tasks (a single default-size row group = ONE task)
        rg = ", ROW_GROUP_SIZE 4096" if t in ("documents", "embeddings") else ""
        if shift is None:
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT parquet)")
            print(f"{t}: copied 1x")
            continue
        n = con.sql(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        if t == "embeddings":
            # convex interpolation toward a same-label partner (see
            # module doc): b is the (1 + hash) -th next row in a's
            # label group (mod group size, never a itself), t is a
            # per-(vec_id, rep) hash in [0.05, 0.95]. A singleton
            # label group (cnt = 1) has no partner: offset 0 makes b
            # = a (self-copy, replica verbatim) instead of a modulo-
            # by-zero NULL that would drop the row from EVERY replica
            # including rep 0.
            con.sql(f"""
              COPY (
                WITH s AS (SELECT *,
                             ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) - 1 AS rn,
                             COUNT(*) OVER (PARTITION BY label) AS cnt
                           FROM '{src}'),
                     reps AS (SELECT UNNEST(range({REPS})) AS rep)
                SELECT a.vec_id + r.rep * {n} AS vec_id,
                       CASE WHEN r.rep = 0 THEN a.embedding
                            ELSE list_transform(range(1, array_length(a.embedding) + 1),
                                   i -> CAST(a.embedding[i]
                                        + ((500 + CAST(hash(a.vec_id || '|' || r.rep || '|t') % 9001 AS BIGINT)) / 10000.0)
                                          * (b.embedding[i] - a.embedding[i]) AS FLOAT))
                       END AS embedding,
                       a.label
                FROM s a, reps r
                JOIN s b ON b.label = a.label
                  AND b.rn = (a.rn + CASE WHEN a.cnt > 1
                                THEN 1 + CAST(hash(a.vec_id || '|' || r.rep || '|p') % (a.cnt - 1) AS BIGINT)
                                ELSE 0 END) % a.cnt
                ORDER BY 1
              ) TO '{dst}' (FORMAT parquet{rg})""")
            dup = con.sql(
                f"SELECT COUNT(*) - COUNT(DISTINCT embedding::VARCHAR) FROM '{dst}'"
            ).fetchone()[0]
            print(f"{t}: {n} x {REPS} (interpolated; duplicate vectors: {dup})")
            continue
        cols = [d[0] for d in con.sql(f"SELECT * FROM '{src}' LIMIT 0").description]
        # per-replica deterministic token permutation: sort tokens by a
        # salted md5 (32 hex chars + '~' prefix; token recovered as
        # substr(·, 34) so no separator collision is possible)
        permuted = (
            "'rep' || r.rep || 'tok ' || array_to_string(list_transform("
            "list_sort(list_transform(string_split(text, ' '), "
            "t -> md5(t || '|' || r.rep) || '~' || t)), "
            "s -> s[34:]), ' ')")
        lateral = ""
        sel = []
        for c in cols:
            if c in shift:
                sel.append(f"{c} + r.rep * {n} AS {c}")
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "CASE WHEN r.rep = 0 THEN n_chars "
                    f"WHEN r.rep < {DUP_REPS} THEN n_chars + LENGTH('rep' || r.rep || 'tok ') "
                    "ELSE LENGTH(tx.newtext) END AS n_chars")
                lateral = f", LATERAL (SELECT {permuted} AS newtext) tx"
            elif t == "documents" and c == "text":
                # reps 1..DUP_REPS-1: distinct leading token -> ~0.95-
                # Jaccard near-dup families (rep 0 keeps the original);
                # reps >= DUP_REPS: salted token permutation -> unique
                # content, token multiset preserved
                sel.append(
                    "CASE WHEN r.rep = 0 THEN text "
                    f"WHEN r.rep < {DUP_REPS} THEN 'rep' || r.rep || 'tok ' || text "
                    "ELSE tx.newtext END AS text")
            else:
                sel.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}', "
            f"(SELECT UNNEST(range({REPS})) AS rep) r{lateral} ORDER BY 1) "
            f"TO '{dst}' (FORMAT parquet{rg})")
        print(f"{t}: {n} x {REPS}")
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Regenerate the 10x scaling corpus at /tmp/sfbig (wiped between rounds).

Recipe (docs/SCALING.md): replicate the sf0.1 driver tables 10x with
shifted keys — unique ids, same time range (10x heavier days);
`documents` replicas get a distinct leading token so each doc is a
~0.95-Jaccard near-dup of its 9 siblings (deliberately DUP-HEAVY, the
hard case for LSH). Driver-side tooling only (duckdb), like selfcheck.py.

Usage: python3 tools/make_sfbig.py [src_dir] [out_dir] [reps]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

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
        cols = [d[0] for d in con.sql(f"SELECT * FROM '{src}' LIMIT 0").description]
        sel = []
        for c in cols:
            if c in shift:
                sel.append(f"{c} + r.rep * {n} AS {c}")
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "CASE WHEN r.rep = 0 THEN n_chars "
                    "ELSE n_chars + LENGTH('rep' || r.rep || 'tok ') END AS n_chars")
            elif t == "documents" and c == "text":
                # distinct leading token per replica -> ~0.95-Jaccard
                # near-dup families (rep 0 keeps the original text)
                sel.append(
                    "CASE WHEN r.rep = 0 THEN text "
                    "ELSE 'rep' || r.rep || 'tok ' || text END AS text")
            else:
                sel.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}', "
            f"(SELECT UNNEST(range({REPS})) AS rep) r ORDER BY 1) "
            f"TO '{dst}' (FORMAT parquet{rg})")
        print(f"{t}: {n} x {REPS}")
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Synthesize a larger scale factor by replicating an existing testdata dir.

``python tools/gen_scale.py SRC_DIR OUT_DIR K`` replicates every table K×
with key-space offsets so referential integrity holds within each copy:
copy i shifts every key (custkey, orderkey, partkey, suppkey, doc_id,
vec_id, event_id, user_id) by ``i * 10**9``. Dimension tables small enough
to be pure lookups (region, nation) are NOT replicated — TPC-H holds them
constant across SF too, and replicating them would break the engine's
broadcast-dim assumption for the wrong reason.

Near-dup realism: document text gets a per-copy marker token and
embeddings a per-copy last-dim nudge, so within-copy duplicate structure
is preserved (pair counts scale linearly with K) while cross-copy rows do
not all collapse into artificial duplicate clusters (which would scale
candidate pairs quadratically and measure a different workload).

DuckDB generates + writes (single parquet file per table, same
arrow types as the source), so the output dirs are drop-in for both the
Spark loaders and the DuckDB oracle harness.
"""

from __future__ import annotations

import sys

import duckdb

OFF = 10**9

# per-table: (key columns to offset, special handling)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main(src: str, out: str, k: int) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT parquet)")
        print(t, "copied")
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                # CAST keeps the source's int64 key type after the addition
                sel.append(f"CAST({c} + cp.i * {OFF} AS BIGINT) AS {c}")
            elif t == "documents" and c == "text":
                # interleave a per-copy marker token after every 5th token:
                # within-copy near-dup pairs keep their marker pattern (so
                # per-copy duplicate structure — and near-dup op work —
                # scales LINEARLY with K), while cross-copy shingle jaccard
                # drops below typical thresholds (~0.33 for 3-grams), so
                # replication does not fabricate a 10x-denser dup corpus
                sel.append(
                    "CASE WHEN cp.i = 0 THEN text ELSE "
                    r"regexp_replace(text, '((\S+\s+){5})', "
                    r"'\1zqcp' || cp.i || ' ', 'g') END AS text")
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "LENGTH(CASE WHEN cp.i = 0 THEN text ELSE "
                    r"regexp_replace(text, '((\S+\s+){5})', "
                    r"'\1zqcp' || cp.i || ' ', 'g') END) AS n_chars")
            elif t == "part" and c == "p_name":
                # same anti-fabrication rule as documents.text, applied to
                # the catalog: suffix every name token with the copy id so
                # cross-copy names share NO tokens (entity-resolution match
                # edges scale linearly with K instead of K² — the sf3 slope
                # leg sat in the fabricated 30x-denser dup catalog before
                # this), while within-copy duplicate structure is identical
                # and substring predicates (LIKE '%green%') still match
                sel.append(
                    "CASE WHEN cp.i = 0 THEN p_name ELSE "
                    r"regexp_replace(p_name, '(\S+)', "
                    r"'\1zq' || cp.i, 'g') END AS p_name")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CAST(list_transform(embedding, x -> CASE WHEN cp.i = 0 "
                    "THEN x ELSE x + CAST(cp.i AS FLOAT) * 1e-3 END) "
                    "AS FLOAT[]) AS embedding")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
            f"(SELECT UNNEST(range({k})) AS i) cp ORDER BY cp.i) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")
    con.close()


if __name__ == "__main__":
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    main(src, out, k)

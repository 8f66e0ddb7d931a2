"""Pinned invariant for semantic_dedup (SemDeDup drop rule).

The k-means cell assignment is a partition choice, not a correctness
claim — ANY assignment yields a valid SemDeDup. What must hold exactly,
for a fixed assignment, is the drop rule:

    kept = corpus − { b : ∃ a < b in the same cell with cos(a, b) ≥ t }

This test holds one assignment fixed (assign_cells, the operator's own
clustering) and recomputes the drop rule independently, driver-side, with
the SAME arithmetic the engine commits to everywhere (left-to-right double
fold over float→double-casted products — see similarity._dot), so the
comparison is bit-exact: no tolerance, no near-threshold exclusions.
"""

from __future__ import annotations

import math

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.similarity import assign_cells, semantic_dedup
from tests.conftest import SF_DIR

THRESHOLD = 0.45


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)  # float32→double exact; fold left-to-right
    return acc


def _seq_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def test_semantic_dedup_drop_rule_is_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned = assign_cells(emb, n_lists=8, iters=2).cache()

    kept = semantic_dedup(emb, threshold=THRESHOLD, n_lists=8, iters=2,
                          assignments=assigned)
    kept_ids = {r["vec_id"] for r in kept.collect()}

    rows = assigned.collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cluster_id"], []).append(
            (r["vec_id"], r["embedding"]))
    expect_dropped = set()
    for members in by_cell.values():
        members.sort()
        norms = {i: _seq_norm(v) for i, v in members}
        for ai in range(len(members)):
            a_id, a_v = members[ai]
            for bi in range(ai + 1, len(members)):
                b_id, b_v = members[bi]
                cos = _seq_dot(a_v, b_v) / (norms[a_id] * norms[b_id])
                if cos >= THRESHOLD:
                    expect_dropped.add(b_id)

    all_ids = {r["vec_id"] for r in rows}
    assert kept_ids == all_ids - expect_dropped
    # sanity: the threshold actually bites at this SF (non-vacuous test)
    assert expect_dropped, "invariant test is vacuous — no pair ≥ threshold"
    assigned.unpersist()
    release_pinned()

"""Hypothesis properties for the round-5 sketch/graph/analytics ops."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.graph import SCALE, pagerank_fixed
from bqetl_spark.functions.sketch import kmv_distinct


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(0, 400), min_size=1, max_size=300),
       k=st.integers(2, 64))
def test_kmv_equals_single_machine_replica(spark, vals, k):
    """For ANY value multiset and ANY k, the distributed sketch equals the
    single-machine KMV (exact below k, (k-1)/kth-order-statistic at k) —
    i.e. the merge is lossless and the estimate is a pure function of the
    distinct-value set."""
    df = spark.createDataFrame([("g", f"v{v}") for v in vals], ["grp", "v"])
    [row] = kmv_distinct(df.repartition(5), "v", "grp", k=k).collect()
    hs = sorted({int(hashlib.md5(f"v{v}".encode()).hexdigest()[:15], 16)
                 for v in vals})
    if len(hs) < k:
        assert (row["est_distinct"], row["kth_hash"]) == (len(hs), None)
    else:
        kth = hs[k - 1]
        assert row["kth_hash"] == kth
        assert row["est_distinct"] == int((k - 1) * float(16 ** 15) / kth)


@settings(max_examples=6, deadline=None)
@given(edges=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                      min_size=1, max_size=30),
       iters=st.integers(1, 3))
def test_pagerank_equals_python_replica_any_graph(spark, edges, iters):
    """Arbitrary multigraphs (self-loops and parallel edges included):
    the Spark loop must reproduce the plain-Python integer recurrence
    exactly. Parallel edges count once per occurrence in outdeg and
    contribute once each, matching the SQL-oracle semantics."""
    sdf = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    nodes = sorted({f"n{x}" for e in edges for x in e})
    n = len(nodes)
    outdeg: dict[str, int] = {}
    for a, _ in edges:
        outdeg[f"n{a}"] = outdeg.get(f"n{a}", 0) + 1
    base = (15 * SCALE) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for a, b in edges:
            s, t = f"n{a}", f"n{b}"
            nxt[t] += int(85 * rank[s]) // (100 * outdeg[s])
        rank = nxt
    got = {r["node"]: r["rank"]
           for r in pagerank_fixed(sdf, iters=iters).collect()}
    release_pinned()
    assert got == rank

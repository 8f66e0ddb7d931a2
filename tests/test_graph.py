"""pagerank_fixed: invariants of the integer fixed-point recurrence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.graph import SCALE, pagerank_fixed


@pytest.fixture
def tri(spark):
    # a -> b -> c -> a plus a dangling sink d fed by a
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], ["src", "dst"])


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_cycle_is_uniform(spark):
    """On a vertex-transitive graph (directed 3-cycle) every node must get
    the identical rank at every iteration — any asymmetry would mean the
    recurrence depends on partitioning or node order."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    r = _ranks(pagerank_fixed(edges, iters=4))
    release_pinned()
    assert len(set(r.values())) == 1
    # no dangling nodes, so total mass decays only via floor drops (< 1
    # unit per node per iteration)
    assert sum(r.values()) > SCALE - 3 * 5


def test_sink_outranks_nothing_and_mass_decays(spark, tri):
    r = _ranks(pagerank_fixed(tri, iters=3))
    release_pinned()
    # d only receives; it has no out-edges, so its damped mass leaks and
    # the total is strictly below SCALE but still positive for everyone
    assert all(v > 0 for v in r.values())
    assert sum(r.values()) < SCALE
    # b and d each receive exactly half of a's contribution -> identical
    # ranks; a additionally receives c's full contribution -> a outranks
    # the sink
    assert r["b"] == r["d"]
    assert r["a"] > r["d"]


def test_deterministic_across_partitionings(spark, tri):
    a = _ranks(pagerank_fixed(tri.repartition(1), iters=3))
    release_pinned()
    b = _ranks(pagerank_fixed(tri.repartition(7, "dst"), iters=3))
    release_pinned()
    assert a == b


def test_validation(spark, tri):
    with pytest.raises(ValueError):
        pagerank_fixed(tri, iters=0)
    with pytest.raises(ValueError):
        pagerank_fixed(tri, damping_pct=100)


def test_python_replica_matches(spark, tri):
    """Bit-exact replay of the recurrence in plain Python — the same
    independence check the DuckDB oracle does, but engine-free."""
    edges = [(r["src"], r["dst"]) for r in tri.collect()]
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (15 * SCALE) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(3):
        nxt = {v: base for v in nodes}
        for s, t in edges:
            nxt[t] += int(85 * rank[s] // (100 * outdeg[s]))
        rank = nxt
    got = _ranks(pagerank_fixed(tri, iters=3))
    release_pinned()
    assert got == rank


def test_shuffle_join_fallback_equals_broadcast_path(spark, tri):
    """Above broadcast_nodes_max the loop switches to shuffle joins for
    ranks and degrees — integer arithmetic makes the two physical paths
    bit-identical, which this pins (the fallback is what runs at
    billion-node scale, so it must not be dead untested code)."""
    a = _ranks(pagerank_fixed(tri, iters=3))
    release_pinned()
    b = _ranks(pagerank_fixed(tri, iters=3, broadcast_nodes_max=0))
    release_pinned()
    assert a == b


def test_cooccurrence_long_ids_and_label_roundtrip(spark):
    """r6: node ids are disjoint longs (2c / 2s+1) so per-iteration
    broadcasts and shuffle keys are 8 bytes; node_label decodes back to
    the 'c:'/'s:' strings for display."""
    from bqetl_spark.functions.graph import cooccurrence_edges, node_label

    orders = spark.createDataFrame([(1, 10), (2, 11)],
                                   ["o_orderkey", "o_custkey"])
    li = spark.createDataFrame([(1, 5), (2, 5)],
                               ["l_orderkey", "l_suppkey"])
    e = cooccurrence_edges(orders, li)
    assert dict(e.dtypes) == {"src": "bigint", "dst": "bigint"}
    got = {(r["src"], r["dst"]) for r in e.collect()}
    assert got == {(20, 11), (22, 11), (11, 20), (11, 22)}
    labels = {r["l"] for r in
              e.select(node_label("src").alias("l")).collect()}
    assert labels == {"c:10", "c:11", "s:5"}


def test_node_label_exact_above_2_53(spark):
    """ADVICE r6: float division decoded ids >= 2^53 lossily; the shift
    formulation must be exact for the full LONG range of keys."""
    from bqetl_spark.functions.graph import node_label

    big = (1 << 60) + 12345
    df = spark.createDataFrame(
        [(big * 2,), (big * 2 + 1,), (0,), (1,)], "node long")
    got = sorted(r["l"] for r in
                 df.select(node_label("node").alias("l")).collect())
    assert got == sorted([f"c:{big}", f"s:{big}", "c:0", "s:0"])

"""hits_fixed: invariants of the integer fixed-point HITS recurrence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.graph import HITS_SCALE, hits_fixed


@pytest.fixture
def bip(spark):
    # bipartite: u1 points at v1,v2,v3; u2 at v1; u3 at v1,v2 —
    # v1 is the strongest authority, u1 the strongest hub
    return spark.createDataFrame(
        [("u1", "v1"), ("u1", "v2"), ("u1", "v3"),
         ("u2", "v1"), ("u3", "v1"), ("u3", "v2")], ["src", "dst"])


def _scores(df):
    return {r["node"]: (r["hub"], r["auth"]) for r in df.collect()}


def _python_hits(edges, iters=5):
    S = HITS_SCALE
    h = {u: S for u, _ in edges}
    a = {}
    for _ in range(iters):
        a_raw = {}
        for u, v in edges:
            a_raw[v] = a_raw.get(v, 0) + h.get(u, 0)
        mx = max(a_raw.values())
        a = {v: (x * S) // mx for v, x in a_raw.items()}
        h_raw = {}
        for u, v in edges:
            h_raw[u] = h_raw.get(u, 0) + a[v]
        mx = max(h_raw.values())
        h = {u: (x * S) // mx for u, x in h_raw.items()}
    out = {}
    for u in h:
        out[u] = (h[u], a.get(u))
    for v in a:
        if v not in out:
            out[v] = (None, a[v])
    return out


def test_python_replica_matches(spark, bip):
    edges = [(r["src"], r["dst"]) for r in bip.collect()]
    got = _scores(hits_fixed(bip, iters=5))
    release_pinned()
    assert got == _python_hits(edges, iters=5)


def test_max_normalization_and_ordering(spark, bip):
    s = _scores(hits_fixed(bip, iters=3))
    release_pinned()
    hubs = {k: v[0] for k, v in s.items() if v[0] is not None}
    auths = {k: v[1] for k, v in s.items() if v[1] is not None}
    # max-normalization pins the top score of each phase to exactly S
    assert max(hubs.values()) == HITS_SCALE
    assert max(auths.values()) == HITS_SCALE
    # v1 (indeg 3 from the best hubs) dominates; u1 (outdeg 3) dominates
    assert max(auths, key=auths.get) == "v1"
    assert max(hubs, key=hubs.get) == "u1"
    # pure sources carry no authority, pure sinks no hub score
    assert s["u1"][1] is None and s["v1"][0] is None


def test_deterministic_across_partitionings(spark, bip):
    a = _scores(hits_fixed(bip, iters=4))
    release_pinned()
    b = _scores(hits_fixed(bip.repartition(7, "dst"), iters=4))
    release_pinned()
    assert a == b


def test_shuffle_join_fallback_equals_broadcast_path(spark, bip):
    fast = _scores(hits_fixed(bip, iters=3))
    release_pinned()
    slow = _scores(hits_fixed(bip, iters=3, broadcast_nodes_max=0))
    release_pinned()
    assert fast == slow


def test_validation(spark, bip):
    with pytest.raises(ValueError, match="iters"):
        hits_fixed(bip, iters=0)


def test_symmetric_bipartite_is_uniform(spark):
    """On K_{2,2} every hub (and every authority) is structurally
    identical, so any score asymmetry would expose order dependence."""
    edges = spark.createDataFrame(
        [("u1", "v1"), ("u1", "v2"), ("u2", "v1"), ("u2", "v2")],
        ["src", "dst"])
    s = _scores(hits_fixed(edges, iters=4))
    release_pinned()
    assert s["u1"] == s["u2"] == (HITS_SCALE, None)
    assert s["v1"] == s["v2"] == (None, HITS_SCALE)


# --- bfs_distances (same module, shares the graph fixtures) ---


def test_bfs_hand_graph(spark):
    from bqetl_spark.functions.graph import bfs_distances

    # path a->b->c->d->e plus both directions, seed {a}
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        pairs + [(y, x) for x, y in pairs], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, seeds, max_hops=3).collect()}
    release_pinned()
    # e is 4 hops away -> absent at max_hops=3
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_multi_source_takes_min(spark):
    from bqetl_spark.functions.graph import bfs_distances

    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        pairs + [(y, x) for x, y in pairs], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("d",)], ["node"])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, seeds, max_hops=3).collect()}
    release_pinned()
    assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_bfs_seed_outside_graph_ignored_and_early_exit(spark):
    from bqetl_spark.functions.graph import bfs_distances

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("ghost",)], ["node"])
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, seeds, max_hops=5).collect()}
    release_pinned()
    assert got == {"a": 0, "b": 1}  # ghost absent; loop exits early


def test_bfs_deterministic_across_partitionings(spark):
    from bqetl_spark.functions.graph import bfs_distances

    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = spark.createDataFrame(
        pairs + [(y, x) for x, y in pairs], ["src", "dst"])
    seeds = spark.createDataFrame([("n0",)], ["node"])
    a = sorted(map(tuple, bfs_distances(edges, seeds, max_hops=4)
                   .collect()))
    release_pinned()
    b = sorted(map(tuple, bfs_distances(edges.repartition(9), seeds,
                                        max_hops=4).collect()))
    release_pinned()
    assert a == b


def test_bfs_validation(spark):
    from bqetl_spark.functions.graph import bfs_distances

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(edges, seeds, max_hops=0)


# --- sssp_distances (r11, same module) ---


def test_sssp_weighted_beats_hop_shortest(spark):
    """The semantic point of weighted SSSP: a 2-edge cheap path (1+1=2)
    must beat the 1-edge expensive direct link (10) — where
    bfs_distances would report hop distance 1."""
    from bqetl_spark.functions.graph import bfs_distances, sssp_distances
    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "m", 1), ("m", "b", 1), ("b", "c", 5)],
        ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"]
           for r in sssp_distances(edges, seeds, max_rounds=6).collect()}
    release_pinned()
    assert got == {"a": 0, "m": 1, "b": 2, "c": 7}
    hops = {r["node"]: r["dist"]
            for r in bfs_distances(edges.select("src", "dst"), seeds,
                                   max_hops=4).collect()}
    release_pinned()
    assert hops["b"] == 1  # hop metric disagrees — different op, both right


def test_sssp_fixed_point_idempotent_and_multi_source(spark):
    from bqetl_spark.functions.graph import sssp_distances
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 3), ("z", "c", 1), ("c", "d", 2),
         ("x", "y", 7)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",), ("z",)], ["node"])
    r6 = {r["node"]: r["dist"]
          for r in sssp_distances(edges, seeds, max_rounds=6).collect()}
    release_pinned()
    r12 = {r["node"]: r["dist"]
           for r in sssp_distances(edges, seeds, max_rounds=12).collect()}
    release_pinned()
    assert r6 == r12                       # early exit at the fixed point
    assert r6["c"] == 1 and r6["d"] == 3   # z's cheap route wins over a's
    assert "x" not in r6 and "y" not in r6  # unreachable stay absent


def test_sssp_rejects_negative_weights(spark):
    from bqetl_spark.functions.graph import sssp_distances
    edges = spark.createDataFrame([("a", "b", -1)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(ValueError, match="non-negative"):
        sssp_distances(edges, seeds)
    release_pinned()

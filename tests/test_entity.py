"""Entity resolution: blocking, overlap threshold, transitive merge,
singleton handling, canonical selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from bqetl_spark.functions.entity import resolve_entities


def _res(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["p_partkey", "p_name", "p_brand"])
    return {r["id"]: (r["canon_id"], r["cluster_size"], r["is_canonical"])
            for r in resolve_entities(df, **kw).collect()}


def test_same_name_same_block_merges(spark):
    got = _res(spark, [
        (1, "red widget", "B1"), (2, "red widget", "B1"),
        (3, "red widget", "B2"),                  # other block: no merge
        (4, "blue bolt", "B1"),                   # singleton
    ])
    assert got == {1: (1, 2, True), 2: (1, 2, False),
                   3: (3, 1, True), 4: (4, 1, True)}


def test_transitive_merge_through_shared_tokens(spark):
    """1~2 share 'red widget' tokens? No — chain via min_common=1:
    1('red widget') ~ 2('red bolt') ~ 3('steel bolt') merges all three
    transitively even though 1 and 3 share nothing."""
    got = _res(spark, [
        (1, "red widget", "B"), (2, "red bolt", "B"),
        (3, "steel bolt", "B"),
    ], min_common=1)
    assert got == {1: (1, 3, True), 2: (1, 3, False), 3: (1, 3, False)}


def test_token_order_and_duplicates_ignored(spark):
    """'widget red' == 'red widget' as a distinct-token SET; repeated
    tokens don't inflate the overlap count."""
    got = _res(spark, [(1, "red widget", "B"), (2, "widget red", "B"),
                       (3, "red red", "B")])
    assert got[1] == (1, 2, True) and got[2] == (1, 2, False)
    assert got[3] == (3, 1, True)  # {'red'} ∩ {'red','widget'} = 1 < 2


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", "B")],
                               ["p_partkey", "p_name", "p_brand"])
    with pytest.raises(ValueError):
        resolve_entities(df, min_common=0)
    with pytest.raises(ValueError):
        resolve_entities(df, block_cols=())


def test_gate_corpus_invariants(spark):
    """On the real part table: every record appears exactly once, every
    canon is the min id of its cluster, sizes are consistent."""
    part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    rows = resolve_entities(part).collect()
    assert len(rows) == part.count()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canon_id"], []).append(r)
    for canon, members in by_canon.items():
        assert canon == min(m["id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)
        assert sum(m["is_canonical"] for m in members) == 1


def test_max_block_size_guard_drops_hot_block_to_singletons(spark):
    """A block above the cap contributes NO pairs — its records stay in
    the output as singletons; other blocks still merge (r7 guard, found
    by the sf1 slope run)."""
    rows = [(i, "red widget", "HOT") for i in range(1, 6)]   # block of 5
    rows += [(10, "blue bolt", "COLD"), (11, "blue bolt", "COLD")]
    got = _res(spark, rows, max_block_size=4)
    for i in range(1, 6):
        assert got[i] == (i, 1, True)
    assert got[10] == (10, 2, True) and got[11] == (10, 2, False)
    # cap >= block size: behavior identical to unguarded
    assert _res(spark, rows, max_block_size=5) == _res(spark, rows)


def test_max_block_size_validation(spark):
    df = spark.createDataFrame([(1, "a b", "B")],
                               ["p_partkey", "p_name", "p_brand"])
    with pytest.raises(ValueError):
        resolve_entities(df, max_block_size=1)

"""Property-based tests (hypothesis) for the reshaping core.

The reference's tests are golden-value only (SURVEY.md §5); these check the
operator invariants on arbitrary inputs. Example counts are kept small —
each example is a Spark job.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bqetl_spark.operators.nest import nest, split_repeated


@settings(max_examples=10, deadline=None)
@given(n_children=st.integers(0, 57), limit=st.integers(1, 20))
def test_split_repeated_partitions_exactly(spark, n_children, limit):
    parent = spark.createDataFrame([(1, list(range(n_children)))],
                                   "k int, arr array<int>")
    out = split_repeated(parent, "arr", limit=limit).collect()
    chunks = [r["arr"] for r in out]
    # invariant 1: concatenation reproduces the original list in order
    assert [x for c in chunks for x in c] == list(range(n_children))
    # invariant 2: every chunk ≤ limit; all but the last exactly == limit
    assert all(len(c) <= limit for c in chunks)
    assert all(len(c) == limit for c in chunks[:-1])
    # invariant 3: empty array still yields one (empty) row
    assert len(chunks) >= 1


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                min_size=0, max_size=40))
def test_nest_preserves_children_exactly(spark, pairs):
    parents = spark.createDataFrame([(k,) for k in range(6)], "k int")
    if pairs:
        children = spark.createDataFrame(pairs, "ck int, v int")
    else:
        children = spark.createDataFrame([], "ck int, v int")
    out = nest(parents, children, "k", "ck", "vs", child_cols=["v"],
               sort_children_by="v")
    got = {r["k"]: sorted(c["v"] for c in r["vs"]) for r in out.collect()}
    # every parent present; children partitioned by key, none lost or invented
    assert set(got) == set(range(6))
    for k in range(6):
        expect = sorted(v for ck, v in pairs if ck == k)
        assert got[k] == expect

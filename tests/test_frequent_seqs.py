"""frequent_subsequences: gapped-subsequence support invariants."""

from __future__ import annotations

import datetime as dt
from itertools import product

import pytest

from bqetl_spark.caching import release_pinned
from bqetl_spark.operators.timeseries import frequent_subsequences

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, streams):
    rows, eid = [], 0
    for user, types in streams.items():
        for i, t in enumerate(types):
            rows.append((eid, BASE + dt.timedelta(seconds=i), user, t))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")


def _py_support(streams, max_len=3):
    def is_subseq(pat, seq):
        it = iter(seq)
        return all(p in it for p in pat)

    alphabet = sorted({t for s in streams.values() for t in s})
    out = {}
    for ln in range(2, max_len + 1):
        for pat in product(alphabet, repeat=ln):
            n = sum(1 for s in streams.values() if is_subseq(pat, s))
            if n:
                out[(">".join(pat), ln)] = n
    return out


def test_matches_bruteforce(spark):
    streams = {
        1: ["a", "b", "a", "c"],
        2: ["b", "a", "c"],
        3: ["c", "c", "b"],
        4: ["a", "a"],
    }
    df = _ev(spark, streams)
    got = {(r["pattern"], r["plen"]): r["support"]
           for r in frequent_subsequences(df, min_support=1).collect()}
    release_pinned()
    assert got == _py_support(streams)


def test_order_matters_and_gaps_allowed(spark):
    streams = {1: ["a", "x", "x", "b"], 2: ["b", "a"]}
    df = _ev(spark, streams)
    got = {(r["pattern"], r["plen"]): r["support"]
           for r in frequent_subsequences(df, min_support=1).collect()}
    release_pinned()
    assert got[("a>b", 2)] == 1      # gapped occurrence in user 1 only
    assert got[("b>a", 2)] == 1      # user 2 only
    assert ("a>b>a", 3) not in got   # nobody has it


def test_repeat_pattern_needs_two_occurrences(spark):
    streams = {1: ["a"], 2: ["a", "a"], 3: ["a", "b", "a"]}
    df = _ev(spark, streams)
    got = {(r["pattern"], r["plen"]): r["support"]
           for r in frequent_subsequences(df, min_support=1).collect()}
    release_pinned()
    assert got[("a>a", 2)] == 2      # users 2 and 3, not 1
    assert got[("a>b>a", 3)] == 1    # the middle-witness path


def test_min_support_filters(spark):
    streams = {i: ["a", "b"] for i in range(5)}
    streams[9] = ["b", "c"]
    df = _ev(spark, streams)
    got = {r["pattern"] for r in
           frequent_subsequences(df, min_support=5).collect()}
    release_pinned()
    assert got == {"a>b"}


def test_validation(spark):
    df = _ev(spark, {1: ["a", "b"]})
    with pytest.raises(ValueError, match="min_support"):
        frequent_subsequences(df, min_support=0)
    with pytest.raises(ValueError, match="max_len"):
        frequent_subsequences(df, max_len=4)

"""lm_greedy_chain: deterministic argmax-walk invariants."""

from __future__ import annotations

import pytest

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.text import lm_greedy_chain

CORPUS = [
    "a b a b a c",       # next(a): b (2) beats c (1); next(b): a
    "z a b",             # next(z) = a
    "c c",               # next(c) = c -> self-loop
]


def _chains(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["seed"], {})[r["step"]] = r["tok"]
    return out


def test_greedy_walk_matches_hand_model(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = _chains(lm_greedy_chain(df, seeds_k=4, steps=4))
    release_pinned()
    # unigram counts: a=4, b=3, c=4, z=1 -> seeds (count desc, tok asc):
    # a(4), c(4), b(3), z(1)
    assert set(got) == {"a", "b", "c", "z"}
    # next(a)=b (2>1), next(b)=a (3), next(c)=c (1, self), next(z)=a
    assert got["a"] == {0: "a", 1: "b", 2: "a", 3: "b", 4: "a"}
    assert got["c"] == {0: "c", 1: "c", 2: "c", 3: "c", 4: "c"}
    assert got["z"] == {0: "z", 1: "a", 2: "b", 3: "a", 4: "b"}


def test_chain_ends_when_token_has_no_continuation(spark):
    # 'end' never occurs as a context: the chain stops after reaching it
    df = spark.createDataFrame([("go end",), ("go end",)], ["text"])
    got = _chains(lm_greedy_chain(df, seeds_k=2, steps=5))
    release_pinned()
    assert got["go"] == {0: "go", 1: "end"}
    assert got["end"] == {0: "end"}


def test_tie_breaks_lexicographic(spark):
    # next(x): 'm' and 'z' both once -> lexicographically smallest wins
    df = spark.createDataFrame([("x m",), ("x z",)], ["text"])
    got = _chains(lm_greedy_chain(df, seeds_k=1, steps=1))
    release_pinned()
    assert got["x"][1] == "m"


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    a = sorted(map(tuple, lm_greedy_chain(df, seeds_k=3, steps=3)
                   .collect()))
    release_pinned()
    b = sorted(map(tuple, lm_greedy_chain(df.repartition(7), seeds_k=3,
                                          steps=3).collect()))
    release_pinned()
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    with pytest.raises(ValueError, match="seeds_k"):
        lm_greedy_chain(df, seeds_k=0)

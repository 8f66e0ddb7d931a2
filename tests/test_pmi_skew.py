"""bigram_pmi and key_skew_report: semantics + the PMI ln-margin audit."""

from __future__ import annotations

import collections
import glob
import math

import pyarrow.parquet as pq
import pytest

from bqetl_spark.functions.text import bigram_pmi, key_skew_report

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
MIN_COUNT = 5


def _python_pmi(texts, min_count):
    uni: collections.Counter = collections.Counter()
    bg: collections.Counter = collections.Counter()
    for x in texts:
        w = (x or "").split()
        uni.update(w)
        bg.update(zip(w, w[1:]))
    m, b = sum(uni.values()), sum(bg.values())
    out = {}
    for (a, c2), n in bg.items():
        if n < min_count:
            continue
        ratio = ((n / uni[a]) * (m / uni[c2])) * (m / b)
        out[(a, c2)] = (n, math.floor(1e6 * math.log(ratio)))
    return out


def test_matches_python_replica(spark):
    texts = ["new york new york city", "york new haven",
             "new york is a city", "the city of new york",
             "new york new york"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {(r["tok_a"], r["tok_b"]): (r["n_pair"], r["pmi_e6"])
           for r in bigram_pmi(df, min_count=2).collect()}
    assert got == _python_pmi(texts, 2)
    # the genuine collocation outranks a chance pair
    assert got[("new", "york")][1] > got[("york", "new")][1]


def test_min_count_prunes(spark):
    df = spark.createDataFrame([("a b",), ("a b",), ("b c",)], ["text"])
    got = bigram_pmi(df, min_count=2).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in got} == {("a", "b")}
    with pytest.raises(ValueError):
        bigram_pmi(df, min_count=0)


def test_short_docs_count_unigrams_only(spark):
    """A 1-token doc shifts M (and thus every PMI) but adds no pairs."""
    base = [("x y",)] * 5
    a = {(r["tok_a"], r["tok_b"]): r["pmi_e6"] for r in bigram_pmi(
        spark.createDataFrame(base, ["text"]), min_count=5).collect()}
    b = {(r["tok_a"], r["tok_b"]): r["pmi_e6"] for r in bigram_pmi(
        spark.createDataFrame(base + [("z",)], ["text"]),
        min_count=5).collect()}
    assert set(a) == set(b) == {("x", "y")}
    assert a[("x", "y")] != b[("x", "y")]


def test_key_skew_report(spark):
    rows = [(1,)] * 60 + [(2,)] * 30 + [(3,)] * 10
    df = spark.createDataFrame(rows, ["k"])
    got = [(r["key"], r["n"], r["share_ppm"])
           for r in key_skew_report(df, "k", k=2).collect()]
    assert got == [("1", 60, 600000), ("2", 30, 300000)]
    with pytest.raises(ValueError):
        key_skew_report(df, "k", k=0)


def test_key_skew_ties_and_nulls(spark):
    rows = [(None,)] * 5 + [(7,)] * 5 + [(8,)] * 3
    df = spark.createDataFrame(rows, "k: bigint")
    got = [(r["key"], r["n"]) for r in
           key_skew_report(df, "k", k=3).collect()]
    # NULL sorts before "7" at equal counts
    assert got == [(None, 5), ("7", 5), ("8", 3)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pmi_margin_on_gate_corpora(sf_dir):
    """Every surviving pair's 1e6·ln(ratio) must clear an integer
    boundary by far more than the ≤1-ulp ln wobble (~4e-9 scaled)."""
    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    texts = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    uni: collections.Counter = collections.Counter()
    bg: collections.Counter = collections.Counter()
    for x in texts:
        w = (x or "").split()
        uni.update(w)
        bg.update(zip(w, w[1:]))
    m, b = sum(uni.values()), sum(bg.values())
    for (a, c2), n in bg.items():
        if n < MIN_COUNT:
            continue
        v = 1e6 * math.log(((n / uni[a]) * (m / uni[c2])) * (m / b))
        assert abs(v - round(v)) > 1e-7, (a, c2, v, sf_dir)


def test_empty_edges(spark):
    """No 2-token doc -> empty PMI (M/B undefined); empty input -> empty
    skew report (ppm undefined) — both return typed empty frames rather
    than dividing by zero."""
    only_short = spark.createDataFrame([("x",), ("",)], ["text"])
    assert bigram_pmi(only_short, min_count=1).count() == 0
    empty = spark.createDataFrame([], "k bigint")
    assert key_skew_report(empty, "k").count() == 0

"""source_divergence: KL identities, determinism, and the ln-boundary
margin audit that underwrites its cross-engine oracle."""

from __future__ import annotations

import collections
import glob
import math

import pyarrow.parquet as pq
import pytest

from bqetl_spark.functions.text import source_divergence

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _kl(df):
    return {r["source"]: (r["n_tokens"], r["kl_e6"], r["kl"])
            for r in df.collect()}


def test_identical_distributions_give_zero(spark):
    rows = [("a", "x y x y"), ("a", "x y"),
            ("b", "x x y y y x")]  # both sources are 50/50 x,y
    df = spark.createDataFrame(rows, ["source", "text"])
    got = _kl(source_divergence(df))
    assert got["a"] == (6, 0, 0.0)
    assert got["b"] == (6, 0, 0.0)


def test_disjoint_vocab_gives_ln2(spark):
    """Two equal-size sources with disjoint vocab: each group's
    distribution doubles every corpus probability -> KL = ln 2 exactly
    (up to the 1e-6 floor quantization)."""
    df = spark.createDataFrame(
        [("a", "aa aa aa"), ("b", "bb bb bb")], ["source", "text"])
    got = _kl(source_divergence(df))
    expect_e6 = 3 * math.floor(1e6 * math.log(2.0))
    assert got["a"] == (3, expect_e6, expect_e6 / 3e6)
    assert got["b"] == (3, expect_e6, expect_e6 / 3e6)
    assert abs(got["a"][2] - math.log(2.0)) < 1e-5


def test_skewed_source_positive_and_partition_invariant(spark):
    rows = ([("norm", "k v a b c d")] * 10
            + [("spam", "z z z z z a")] * 3)
    df = spark.createDataFrame(rows, ["source", "text"])
    a = _kl(source_divergence(df.repartition(1)))
    b = _kl(source_divergence(df.repartition(11, "text")))
    assert a == b
    # KL >= 0 up to floor quantization (each floor subtracts < 1e-6 nat
    # per token); the spam source must read as far more divergent
    assert a["spam"][1] > a["norm"][1]
    assert a["spam"][2] > 0.5  # z-heavy vs mostly-uniform corpus


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ln_margin_on_gate_corpora(sf_dir):
    """Every (group, token) log-ratio term on the real corpora must sit
    clear of an integer boundary by far more than libm noise.

    Noise bound: the ratio itself is computed with identical IEEE ops on
    both engines (exact same operands), so only ln() can differ, by <= 1
    ulp of its result (|ln| <= ~20 -> ulp ~ 3.6e-15), i.e. <= ~4e-9 after
    the 1e6 scaling. The floor is set 25x above that; with ~600 uniform
    draws on a 1e-6 grid the expected minimum margin is ~1e-3·1e-6-grid
    cells, so small margins are EXPECTED and only sub-noise ones are a
    real hazard."""
    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    t = pq.read_table(files[0], columns=["source", "text"]).to_pydict()
    cts: collections.Counter = collections.Counter()
    for s, x in zip(t["source"], t["text"]):
        if not (x or "").strip():
            continue
        for tok in x.split():
            cts[(s, tok)] += 1
    n_g: collections.Counter = collections.Counter()
    d_t: collections.Counter = collections.Counter()
    for (s, tok), c in cts.items():
        n_g[s] += c
        d_t[tok] += c
    m = float(sum(n_g.values()))
    for (s, tok), c in cts.items():
        v = 1e6 * math.log((c / d_t[tok]) * (m / n_g[s]))
        assert abs(v - round(v)) > 1e-7, (s, tok, v, sf_dir)

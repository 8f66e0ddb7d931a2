"""embed_centroids fixed-point exactness + weighted_sample (A-Res)
semantics and the cutoff-gap margin audit for its oracle."""

from __future__ import annotations

import glob
import hashlib
import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.chunking import weighted_sample
from bqetl_spark.functions.similarity import embed_centroids

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
N_SAMPLE = 200


def _key(doc_id: int, w: float) -> float:
    hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return math.log(hv / float(16 ** 15)) / w


def test_centroids_match_python_fixed_point(spark):
    vecs = [(1, [0.5, -0.25, 0.125]), (1, [0.1, 0.2, 0.3]),
            (2, [1.0, 0.0, -1.0])]
    df = spark.createDataFrame(vecs, ["label", "embedding"])
    got = {r["label"]: (r["n_vecs"], r["centroid"]) for r in
           embed_centroids(df, dim=3).collect()}
    q = 16777216.0

    def fx(rows):
        n = len(rows)
        return [sum(math.floor(v * q) for v in col) / (n * q)
                for col in zip(*rows)]

    assert got[1][0] == 2 and got[1][1] == fx([[0.5, -0.25, 0.125],
                                               [0.1, 0.2, 0.3]])
    assert got[2] == (1, fx([[1.0, 0.0, -1.0]]))


def test_centroids_partition_invariant(spark):
    rows = [(i % 3, [float(i) / 7, -float(i) / 11]) for i in range(100)]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    a = sorted(embed_centroids(df.repartition(1), dim=2).collect())
    b = sorted(embed_centroids(df.repartition(17), dim=2).collect())
    assert a == b


def test_weighted_sample_matches_python_ares(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = [r["doc_id"] for r in
           weighted_sample(df, "n_chars", n=50).collect()]
    expect = sorted(rows, key=lambda t: (-_key(t[0], t[1]), t[0]))[:50]
    assert got == [d for d, _ in expect]


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    rows = [(1, 100), (2, 0), (3, -5), (4, None), (5, 100)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {r["doc_id"] for r in weighted_sample(df, "n_chars", n=10).collect()}
    assert got == {1, 5}


def test_weighted_sample_favors_heavy_weights(spark):
    """With weights 1000 vs 1, heavy rows must dominate the sample (the
    priority exponent 1/w pulls heavy-weight priorities toward 1)."""
    rows = [(i, 1000) for i in range(100)] + [(i + 100, 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = [r["doc_id"] for r in weighted_sample(df, "n_chars", n=50).collect()]
    heavy = sum(1 for d in got if d < 100)
    assert heavy >= 45


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["doc_id", "n_chars"])
    with pytest.raises(ValueError):
        weighted_sample(df, "n_chars", n=0)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cutoff_gap_margin_on_gate_corpora(sf_dir):
    """The gap between the 200th and 201st priority keys on the real
    corpora must exceed libm/ulp noise by orders of magnitude, so the
    membership oracle cannot flip. Noise bound: u is exact on both
    engines; ln differs by <= 1 ulp (~2e-16 absolute here), divided by
    w >= 1 -> gap floor 1e-12 is 10^4 above worst-case noise."""
    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    t = pq.read_table(files[0], columns=["doc_id", "n_chars"]).to_pydict()
    keys = sorted((_key(d, w) for d, w in zip(t["doc_id"], t["n_chars"])
                   if w and w > 0), reverse=True)
    if len(keys) <= N_SAMPLE:
        pytest.skip("corpus smaller than sample")
    gap = keys[N_SAMPLE - 1] - keys[N_SAMPLE]
    assert gap > 1e-12, (sf_dir, gap)

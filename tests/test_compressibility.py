"""Compression-ratio quality signal: semantics pinned in pytest because
DuckDB cannot replay DEFLATE (the documented rows-only oracle boundary)."""

from __future__ import annotations

import zlib

import pytest

from bqetl_spark.functions.compressibility import (compressibility_filter,
                                                   compression_ratio)


def _rows(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_ratio_orders_repetitive_below_normal_below_random(spark):
    rep = "spam " * 200
    normal = " ".join(f"tok{i} value{i*7%13}" for i in range(200))
    import random
    rng = random.Random(1)
    rnd = "".join(rng.choice(
        "abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(1000))
    out = {r["doc_id"]: r["ratio_ppm"] for r in
           compression_ratio(_rows(spark, [rep, normal, rnd])).collect()}
    assert out[0] < out[1] < out[2]
    assert out[0] < 100_000           # repeats crush to <10%


def test_ratio_arithmetic_replayed_in_python(spark):
    texts = ["hello world " * 10, "abc", ""]
    got = {r["doc_id"]: (r["n_raw"], r["n_compressed"], r["ratio_ppm"])
           for r in compression_ratio(_rows(spark, texts + [None])).collect()}
    for i, t in enumerate(texts):
        raw = t.encode()
        comp = len(zlib.compress(raw, 6)) if raw else 0
        want = (len(raw), comp,
                comp * 1_000_000 // len(raw) if raw else None)
        assert got[i] == want
    assert got[3] == (0, 0, None)     # NULL text == empty


def test_partition_invariance(spark):
    texts = [f"doc {i} " + "x" * (i % 50) for i in range(100)]
    a = sorted(map(tuple, compression_ratio(_rows(spark, texts)).collect()))
    b = sorted(map(tuple, compression_ratio(
        _rows(spark, texts).repartition(13)).collect()))
    assert a == b


def test_filter_band_keeps_healthy_docs(spark):
    rep = "spam " * 500
    normal = " ".join(f"tok{i} value{i*7%13}" for i in range(200))
    df = _rows(spark, [rep, normal])
    kept = [r["doc_id"] for r in
            compressibility_filter(df).select("doc_id").collect()]
    assert kept == [1]                # repetitive doc dropped


def test_level_validation(spark):
    with pytest.raises(ValueError):
        compression_ratio(_rows(spark, ["x"]), level=11)

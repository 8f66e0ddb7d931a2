"""zipf_slope: integer OLS rank-frequency invariants + ln margin audit."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from bqetl_spark.functions.text import zipf_slope


def _python_zipf(texts, max_rank=1000):
    cnt = Counter(t for x in texts for t in (x or "").split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_rank]
    pts = [(math.floor(10**6 * math.log(r)),
            math.floor(10**6 * math.log(c)))
           for r, (_, c) in enumerate(ranked, start=1)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return n, max(-num, 0) * 10**6 // den


def test_matches_python_replica(spark):
    texts = ["the the the the cat cat dog bird " * 3,
             "the cat sat on the mat with the dog",
             "a b c d e f g h the cat"]
    df = spark.createDataFrame([(t, "en") for t in texts], ["text", "lang"])
    row = zipf_slope(df, group_col="lang").collect()[0]
    n, s = _python_zipf(texts)
    assert (row["n_points"], row["s_ppm"]) == (n, s)


def test_ideal_zipf_corpus_scores_near_one(spark):
    """A synthetic corpus with c_r = floor(1200/r) for ranks 1..40 is
    Zipf with exponent 1; the integer OLS over floored lns must land
    within 3% of 1e6 ppm."""
    words = []
    for r in range(1, 41):
        words += [f"w{r:03d}"] * (1200 // r)
    df = spark.createDataFrame([(" ".join(words), "x")], ["text", "lang"])
    row = zipf_slope(df, group_col="lang").collect()[0]
    assert row["n_points"] == 40
    assert abs(row["s_ppm"] - 10**6) < 30_000


def test_flat_corpus_scores_near_zero(spark):
    """All types equally frequent -> slope 0 (every y equal)."""
    words = [f"w{r}" for r in range(50)] * 4
    df = spark.createDataFrame([(" ".join(words), "x")], ["text", "lang"])
    row = zipf_slope(df, group_col="lang").collect()[0]
    assert row["s_ppm"] == 0


def test_deterministic_across_partitionings(spark):
    texts = [(f"tok{i % 23} tok{i % 7} tok{i % 3} the", "en")
             for i in range(200)]
    df = spark.createDataFrame(texts, ["text", "lang"])
    a = sorted(map(tuple, zipf_slope(df).collect()))
    b = sorted(map(tuple, zipf_slope(df.repartition(13)).collect()))
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a b", "en")], ["text", "lang"])
    with pytest.raises(ValueError, match="max_rank"):
        zipf_slope(df, max_rank=1)


def test_rank_ln_margin_exhaustive():
    """x = floor(1e6·ln r) for EVERY possible rank 1..1000: the ln must
    sit > 1e-5 from an integer so a 1-ulp libm divergence can't flip
    the floor (the token_entropy discipline; ln(1) = 0 is exact)."""
    for r in range(2, 1001):
        v = 10**6 * math.log(r)
        assert abs(v - round(v)) > 1e-5, (r, v)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_count_ln_margin_on_gate_corpora(sf_dir):
    """y = floor(1e6·ln c) for every OBSERVED top-1000 per-lang token
    count on the gate corpora."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    t = pq.read_table(files[0], columns=["lang", "text"]).to_pydict()
    per_lang: dict[str, Counter] = {}
    for lang, text in zip(t["lang"], t["text"]):
        if text and text.strip():
            per_lang.setdefault(lang, Counter()).update(text.split())
    counts = set()
    for cnt in per_lang.values():
        counts.update(c for _, c in cnt.most_common(1000))
    for c in counts:
        if c == 1:
            continue  # ln(1) = 0 exactly
        v = 10**6 * math.log(c)
        assert abs(v - round(v)) > 1e-5, (c, v)

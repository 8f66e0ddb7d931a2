"""HyperLogLog + Bloom filter (r7): register semantics vs a Python
reference, mergeability, both estimator regimes, the linear-counting ln
margin audit (ALL 255 possible arguments), and the bloom zero-false-
negative / map-only-probe contracts."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.sketch import (
    HLL_ALPHA_PPM,
    HLL_M,
    HLL_RAW_NUM,
    HLL_RHO_MAX,
    HLL_W,
    bloom_build,
    bloom_might_contain,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


# ---------------------------------------------------------------- HLL --

def _py_registers(values):
    """Reference HLL registers computed with hashlib — the ground truth
    both the Spark op and the DuckDB oracle must reproduce."""
    regs: dict[int, int] = {}
    for v in values:
        hv = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket = hv >> HLL_W
        rest = hv & ((1 << HLL_W) - 1)
        rho = HLL_RHO_MAX if rest == 0 else HLL_W - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs):
    v = len(regs)
    s = (HLL_M - v) * (1 << HLL_RHO_MAX) + sum(
        1 << (HLL_RHO_MAX - r) for r in regs.values())
    raw = HLL_RAW_NUM // (10**6 * s)
    if v < HLL_M and raw <= 5 * HLL_M // 2:
        z = HLL_M - v  # EMPTY registers — LinearCounting's argument
        return (HLL_M * math.floor(10**6 * math.log(HLL_M / z))) // 10**6
    return raw


def test_registers_match_python_reference(spark):
    vals = [f"item-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["bucket"]: r["max_rho"]
           for r in hll_sketch(df, "v").collect()}
    assert got == _py_registers(vals)


def test_estimate_matches_python_reference_both_regimes(spark):
    # raw regime (n >> 640) and linear-counting regime (small n)
    for n in (40, 5000):
        vals = [f"k{i}" for i in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        est = hll_estimate(hll_sketch(df, "v")).collect()[0]
        assert est["est"] == _py_estimate(_py_registers(vals)), n


def test_estimate_accuracy(spark):
    """Standard error is ~1.04/sqrt(256) = 6.5%; allow 3 sigma."""
    n = 20000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], ["v"])
    est = hll_estimate(hll_sketch(df, "v")).collect()[0]["est"]
    assert abs(est - n) / n < 0.20, est


def test_linear_counting_small_sets(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    close to exact (lc is near-exact when V << m)."""
    n = 30
    df = spark.createDataFrame([(f"s{i}",) for i in range(n)], ["v"])
    row = hll_estimate(hll_sketch(df, "v")).collect()[0]
    assert row["n_buckets"] <= n
    assert abs(row["est"] - n) <= 3, row


def test_merge_equals_union_sketch(spark):
    """merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) REGISTER FOR
    REGISTER — the mergeability that lets daily sketches fold into a
    stored table without rescanning history (kmv_incremental's
    contract, here exact on the state itself)."""
    rows = [("g%d" % (i % 3), f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    a = hll_sketch(df.filter(F.crc32(F.col("v")) % 2 == 0), "v", "grp")
    b = hll_sketch(df.filter(F.crc32(F.col("v")) % 2 == 1), "v", "grp")
    merged = {(r["grp"], r["bucket"]): r["max_rho"]
              for r in hll_merge(a, b).collect()}
    full = {(r["grp"], r["bucket"]): r["max_rho"]
            for r in hll_sketch(df, "v", "grp").collect()}
    assert merged == full


def test_lc_ln_margin_all_arguments():
    """The linear-counting branch's floor(1e6·ln(256/Z)) has exactly 255
    possible arguments (Z = empty registers in 1..255). Audit every one:
    the value must sit >1e-5 from an integer so a 1-ulp libm difference
    between Java's Math.log and DuckDB's can never flip the floor. The
    worst case over the whole domain is Z=59 at 5.7e-4; a 1-ulp
    divergence on x ≈ 1.5e6 is ~5e-10, so 1e-5 keeps >4 orders of
    headroom — this is the tfidf idf discipline, but CLOSED over the
    entire input domain rather than sampled from the corpus."""
    for z in range(1, HLL_M):
        x = 10**6 * math.log(HLL_M / z)
        assert abs(x - round(x)) > 1e-5, (z, x)


def test_null_values_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], ["v"])
    regs = hll_sketch(df, "v").collect()
    assert {r["bucket"]: r["max_rho"] for r in regs} == \
        _py_registers(["a", "b"])


# -------------------------------------------------------------- Bloom --

def test_bloom_zero_false_negatives(spark):
    members = [f"key-{i}" for i in range(800)]
    build = spark.createDataFrame([(m,) for m in members], ["k"])
    words = bloom_build(build, "k", m_bits=8192, k_hashes=3)
    assert len(words) == 8192 // 64
    hits = (build.withColumn(
        "bp", bloom_might_contain("k", words, m_bits=8192, k_hashes=3))
        .filter(~F.col("bp")).count())
    assert hits == 0  # every member passes, by construction


def test_bloom_fpr_within_bound(spark):
    """fpr ≈ (1 − e^(−kn/m))^k; assert observed ≤ 3× theoretical."""
    n, m, k = 800, 8192, 3
    build = spark.createDataFrame([(f"in-{i}",) for i in range(n)], ["k"])
    words = bloom_build(build, "k", m_bits=m, k_hashes=k)
    probe = spark.createDataFrame([(f"out-{i}",) for i in range(4000)],
                                  ["k"])
    fp = (probe.withColumn(
        "bp", bloom_might_contain("k", words, m_bits=m, k_hashes=k))
        .filter(F.col("bp")).count())
    theo = (1 - math.exp(-k * n / m)) ** k
    assert fp / 4000 <= 3 * theo + 0.01, (fp, theo)


def test_bloom_probe_is_map_only(spark):
    """The probe side must be pure expressions over the literal bitmap —
    no join, no shuffle, no Python: the plan may not contain a Join or
    an Exchange above the scan."""
    build = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["k"])
    words = bloom_build(build, "k", m_bits=4096, k_hashes=3)
    probe = spark.range(1000).select(
        F.concat(F.lit("p"), F.col("id")).alias("k"))
    out = probe.filter(
        bloom_might_contain("k", words, m_bits=4096, k_hashes=3))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    out.count()  # and it executes


def test_bloom_bitmap_matches_python_fold(spark):
    """The collected bitmap must equal the hashlib reference fold —
    signed two's-complement words included."""
    keys = [f"z{i}" for i in range(50)]
    build = spark.createDataFrame([(v,) for v in keys], ["k"])
    m, kh = 4096, 3
    words = bloom_build(build, "k", m_bits=m, k_hashes=kh)
    ref = [0] * (m // 64)
    for v in keys:
        for i in range(kh):
            hv = int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:15], 16)
            p = hv % m
            ref[p // 64] |= 1 << (p % 64)
    ref = [w - (1 << 64) if w >= (1 << 63) else w for w in ref]
    assert words == ref


def test_bloom_validation(spark):
    build = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        bloom_build(build, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(build, "k", m_bits=64, k_hashes=0)
    words = bloom_build(build, "k", m_bits=128, k_hashes=2)
    with pytest.raises(ValueError):  # m_bits mismatch breaks no-FN
        bloom_might_contain("k", words, m_bits=256, k_hashes=2)


def test_bloom_null_keys_test_false(spark):
    """NULL keys must probe FALSE (concat_ws would otherwise hash the
    bare salt on Spark while SQL || propagates NULL — the cross-engine
    divergence the gate's oracle relies on being closed)."""
    build = spark.createDataFrame([("a",), ("b",)], ["k"])
    words = bloom_build(build, "k", m_bits=4096, k_hashes=3)
    probe = spark.createDataFrame([("a",), (None,)], ["k"])
    got = {r["k"]: r["bp"] for r in probe.withColumn(
        "bp", bloom_might_contain("k", words, m_bits=4096,
                                  k_hashes=3)).collect()}
    assert got["a"] is True
    assert got[None] is False


def test_bloom_filtered_join_equals_plain_join(spark):
    """The composition operator must return EXACTLY the plain join (no
    false negatives => pruning loses nothing; false positives are then
    rejected by the join itself)."""
    from bqetl_spark.operators.joins import bloom_filtered_join

    fact = spark.createDataFrame(
        [(i, f"f{i}") for i in range(2000)], ["fk", "payload"])
    dim = spark.createDataFrame(
        [(i * 7, f"d{i}") for i in range(120)], ["dk", "name"])
    got = sorted(map(tuple, bloom_filtered_join(
        fact, dim, "fk", "dk", m_bits=4096).collect()))
    want = sorted(map(tuple,
                      fact.join(dim, fact.fk == dim.dk, "inner").collect()))
    assert got == want and len(got) > 0


def test_bloom_filtered_join_validation(spark):
    from bqetl_spark.operators.joins import bloom_filtered_join

    fact = spark.createDataFrame([(1, "a")], ["fk", "p"])
    dim = spark.createDataFrame([(1, "b")], ["dk", "n"])
    import pytest as _pt
    with _pt.raises(ValueError):
        bloom_filtered_join(fact, dim, "fk", "dk", how="left")

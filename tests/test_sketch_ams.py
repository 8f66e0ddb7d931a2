"""ams_f2: AMS tug-of-war second-moment sketch invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.sketch import ams_f2


def _sign(j: int, v: str) -> int:
    h = hashlib.md5(f"{j}:{v}".encode()).hexdigest()
    return 1 - 2 * (int(h[0], 16) % 2)


def _python_ams(values, groups=5, per_group=8):
    c = {}
    for v in values:
        c[v] = c.get(v, 0) + 1
    f2 = sum(n * n for n in c.values())
    s = [sum(_sign(j, v) * n for v, n in c.items())
         for j in range(groups * per_group)]
    means = [sum(s[g * per_group + i] ** 2 for i in range(per_group))
             // per_group for g in range(groups)]
    est = sorted(means)[(groups - 1) // 2]
    return f2, est, abs(est - f2) * 10**6 // f2


def test_matches_python_replica(spark):
    values = [w for i in range(60) for w in ("tok%d" % (i % 17), "x")]
    df = spark.createDataFrame([("g", v) for v in values], ["grp", "v"])
    row = ams_f2(df, "v", "grp").collect()[0]
    f2, est, err = _python_ams(values)
    assert (row["f2_exact"], row["f2_est"], row["err_ppm"]) == (f2, est, err)


def test_estimate_tracks_skew(spark):
    """F2 is the self-join size: a heavy-hitter key must blow it up and
    the sketch must follow. 1000 distinct singletons vs 1000 copies of
    one key: exact F2 goes 1000 -> 10^6 and the estimate must stay
    within 50% of exact in both regimes (median-of-means bound is far
    tighter in expectation; 50% is a safe deterministic check for this
    fixed hash)."""
    uniq = [(f"u{i}",) for i in range(1000)]
    skew = [("hot",)] * 1000
    for vals, f2 in ((uniq, 1000), (skew, 1_000_000)):
        df = spark.createDataFrame(vals, ["v"]).withColumn("g", F.lit("g"))
        row = ams_f2(df, "v", "g").collect()[0]
        assert row["f2_exact"] == f2
        assert abs(row["f2_est"] - f2) <= f2 // 2


def test_exact_on_single_value(spark):
    """One distinct value: every estimator is (±c)² = c² exactly, so
    est == exact == c² and err_ppm == 0."""
    df = spark.createDataFrame([("a",)] * 7, ["v"]).withColumn(
        "g", F.lit("g"))
    row = ams_f2(df, "v", "g").collect()[0]
    assert row["f2_exact"] == row["f2_est"] == 49
    assert row["err_ppm"] == 0


def test_deterministic_across_partitionings(spark):
    vals = [("g1", f"t{i % 13}") for i in range(100)] + \
           [("g2", f"t{i % 7}") for i in range(50)]
    df = spark.createDataFrame(vals, ["g", "v"])
    a = sorted(map(tuple, ams_f2(df, "v", "g").collect()))
    b = sorted(map(tuple, ams_f2(df.repartition(11), "v", "g").collect()))
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("g", "a")], ["g", "v"])
    with pytest.raises(ValueError, match="odd"):
        ams_f2(df, "v", "g", groups=4)
    with pytest.raises(ValueError, match="per_group"):
        ams_f2(df, "v", "g", per_group=0)


def test_sketch_estimate_equals_fused_ams_f2(spark):
    """ams_estimate_f2(ams_sketch(x)) must reproduce ams_f2's estimate
    bit-for-bit — the decomposed persistable path and the fused gate
    path are the same estimator."""
    from bqetl_spark.functions.sketch import ams_estimate_f2, ams_sketch

    vals = [("g1", f"t{i % 13}") for i in range(100)] + \
           [("g2", f"t{i % 7}") for i in range(50)]
    df = spark.createDataFrame(vals, ["g", "v"])
    fused = {r["g"]: r["f2_est"] for r in ams_f2(df, "v", "g").collect()}
    deco = {r["g"]: r["f2_est"]
            for r in ams_estimate_f2(ams_sketch(df, "v", "g"),
                                     "g").collect()}
    assert fused == deco


def test_sketch_merges_by_addition_exactly(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) value-for-value —
    the persisted-sketch family contract, exact here (linearity)."""
    from bqetl_spark.functions.sketch import ams_merge, ams_sketch

    vals = [("g", f"t{i % 11}") for i in range(120)]
    df = spark.createDataFrame(vals, ["g", "v"]).withColumn(
        "i", F.monotonically_increasing_id())
    a = ams_sketch(df.filter("i % 2 = 0"), "v", "g")
    b = ams_sketch(df.filter("i % 2 = 1"), "v", "g")
    merged = sorted(map(tuple,
                        ams_merge(a, b).select("g", "j", "s").collect()))
    full = sorted(map(tuple,
                      ams_sketch(df, "v", "g").select("g", "j", "s")
                      .collect()))
    assert merged == full


def test_cms_join_size_upper_bound_and_exact_when_collision_free(spark):
    """The estimator is an upper bound always, and EXACT when the two
    key sets are small enough that no grid cell collides."""
    from bqetl_spark.functions.sketch import cms_join_size, cms_sketch

    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 2, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], ["k"])
    true_size = 3 * 1 + 2 * 2  # k=1: 3x1, k=2: 2x2
    sa, sb = cms_sketch(a, "k"), cms_sketch(b, "k")
    est = cms_join_size(sa, sb).collect()[0]["join_size_est"]
    assert est == true_size  # 4 keys into 256 cells: collision-free


def test_cms_join_size_zero_overlap_rows_count(spark):
    """Disjoint key sets: the true join is 0 — the depth-spine anchor
    must return 0 even though no (d, idx) cells overlap."""
    from bqetl_spark.functions.sketch import cms_join_size, cms_sketch

    a = spark.createDataFrame([("x1",), ("x2",)], ["k"])
    b = spark.createDataFrame([("y1",), ("y2",)], ["k"])
    est = cms_join_size(cms_sketch(a, "k"), cms_sketch(b, "k")) \
        .collect()[0]["join_size_est"]
    assert est == 0

"""Skew/range-join helpers and IVF ANN: result equivalence to the naive
formulations on small data."""

from pyspark.sql import functions as F

from bqetl_spark.functions import similarity as sim
from bqetl_spark.operators.rangejoin import range_join_point
from bqetl_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(50)] + [(2, "x"), (3, "y")],
        ["k", "lval"])  # key 1 is hot
    right = spark.createDataFrame([(1, "A"), (2, "B"), (4, "D")], ["rk", "rval"])
    plain = {(r["k"], r["lval"], r["rval"])
             for r in left.join(right, left["k"] == right["rk"]).collect()}
    salted = {(r["k"], r["lval"], r["rval"])
              for r in salted_join(left, right, "k", "rk", salt=8).collect()}
    assert salted == plain and len(plain) == 51


def test_salted_join_auto_equals_plain_join(spark):
    """salt=None: Misra-Gries hot-key detection + selective scatter must be
    value-invisible — including the degenerate no-hot-keys case."""
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(200)] + [(2, "x"), (3, "y")],
        ["k", "lval"])  # key 1 owns ~99%
    right = spark.createDataFrame([(1, "A"), (2, "B"), (4, "D")], ["rk", "rval"])
    plain = {(r["k"], r["lval"], r["rval"])
             for r in left.join(right, left["k"] == right["rk"]).collect()}
    auto = {(r["k"], r["lval"], r["rval"])
            for r in salted_join(left, right, "k", "rk", salt=None).collect()}
    assert auto == plain and len(plain) == 201
    # uniform keys -> no hot keys -> plain-join fallback, same values
    uni_l = spark.createDataFrame([(i % 97, i) for i in range(200)], ["k", "v"])
    uni_r = spark.createDataFrame([(i, f"r{i}") for i in range(97)], ["rk", "rv"])
    a = {(r["k"], r["v"], r["rv"]) for r in
         salted_join(uni_l, uni_r, "k", "rk", salt=None).collect()}
    b = {(r["k"], r["v"], r["rv"]) for r in
         uni_l.join(uni_r, uni_l["k"] == uni_r["rk"]).collect()}
    assert a == b and len(a) == 200


def test_salted_join_auto_left_join_null_and_unmatched(spark):
    """Left join: unmatched and NULL-key left rows survive exactly once
    (NULL keys get a spread salt but can never equi-match)."""
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(150)] + [(None, "n1"), (None, "n2"),
                                              (9, "u")],
        "k int, lval string")
    right = spark.createDataFrame([(1, "A"), (2, "B")], ["rk", "rval"])
    out = salted_join(left, right, "k", "rk", salt=None, how="left").collect()
    assert len(out) == 153
    nulls = [r for r in out if r["k"] is None]
    assert len(nulls) == 2 and all(r["rval"] is None for r in nulls)
    assert next(r["rval"] for r in out if r["lval"] == "u") is None


def test_hot_keys_exact_counts(spark):
    """Misra-Gries + recount returns EXACT counts for every key above the
    1/k frequency threshold and nothing below it."""
    from bqetl_spark.operators.skew import hot_keys
    rows = ([(1,)] * 500 + [(2,)] * 150 + [(None,)] * 50
            + [(i,) for i in range(100, 400)])
    df = spark.createDataFrame(rows, "k int")
    got = {kv: n for kv, n, total in hot_keys(df, "k", k=8)}
    # total = 1000, threshold n > 1000/8 = 125: keys 1 (500) and 2 (150)
    # qualify; NULLs and the 300 singletons do not
    assert got == {"1": 500, "2": 150}


def test_salted_join_rejects_right_outer(spark):
    import pytest
    left = spark.createDataFrame([(1, "a")], ["k", "lval"])
    right = spark.createDataFrame([(1, "A")], ["rk", "rval"])
    with pytest.raises(ValueError, match="left-preserving"):
        salted_join(left, right, "k", "rk", salt=4, how="right")


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 25), (4, 101)], ["pid", "v"])
    intervals = spark.createDataFrame(
        [(10, 0, 10), (20, 10, 20), (30, 0, 100)], ["iid", "lo", "hi"])
    out = {(r["pid"], r["iid"])
           for r in range_join_point(points, intervals, "v", "lo", "hi",
                                     bucket_width=8).collect()}
    assert out == {(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)}


def test_range_join_bucket_width_irrelevant_to_result(spark):
    points = spark.createDataFrame([(i, i * 3) for i in range(30)], ["pid", "v"])
    intervals = spark.createDataFrame(
        [(j, j * 10, j * 10 + 14) for j in range(8)], ["iid", "lo", "hi"])
    r1 = {(r["pid"], r["iid"]) for r in
          range_join_point(points, intervals, "v", "lo", "hi", 5).collect()}
    r2 = {(r["pid"], r["iid"]) for r in
          range_join_point(points, intervals, "v", "lo", "hi", 50).collect()}
    assert r1 == r2 and len(r1) > 0


def test_ivf_topk_recovers_neighbors(spark):
    # clustered vectors: 4 tight groups in 8-d; IVF must recover same-group
    # neighbors for a query
    import math
    rows = []
    for g in range(4):
        for i in range(10):
            vec = [0.0] * 8
            vec[g * 2] = 1.0
            vec[g * 2 + 1] = 0.05 * i   # slight spread within group
            rows.append((g * 10 + i, vec))
    v = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.ivf_topk(v, v.filter("vec_id = 1"), k=3,
                       n_lists=4, n_probe=2)
    got = [r["neighbor_id"] for r in out.collect()]
    assert len(got) > 0
    assert all(n // 10 == 0 for n in got)  # same cluster as query 1

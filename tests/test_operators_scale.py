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

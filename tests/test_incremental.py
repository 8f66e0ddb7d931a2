"""Incremental aggregate maintenance: delta folding must equal a full
recompute, keys must appear/disappear correctly, bad ops must fail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bqetl_spark.operators.incremental import incremental_agg


def _agg(df):
    return (df.groupBy("k")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.col("v").cast("decimal(18,2)")).alias("s")))


def test_fold_equals_recompute(spark):
    base_rows = spark.createDataFrame(
        [("a", 1.10), ("a", 2.20), ("b", 5.00), ("c", 7.00)],
        "k string, v double")
    changes = spark.createDataFrame(
        [("a", 3.30, "I"),          # insert into existing key
         ("b", 5.00, "D"),          # delete b's only row -> key vanishes
         ("d", 9.99, "I")],         # brand-new key appears
        "k string, v double, op string")
    got = {r["k"]: (r["n_rows"], float(r["s"])) for r in
           incremental_agg(_agg(base_rows), changes, ["k"],
                           sum_specs={"s": "v"}, count_col="n_rows")
           .collect()}
    assert got == {"a": (3, 6.60), "c": (1, 7.00), "d": (1, 9.99)}
    assert "b" not in got            # count reached 0 -> dropped


def test_fold_is_partitioning_invariant(spark):
    rows = [(f"k{i % 7}", float(i)) for i in range(200)]
    base = spark.createDataFrame(rows, "k string, v double")
    ch = spark.createDataFrame(
        [(f"k{i % 7}", float(i), "I" if i % 3 else "D")
         for i in range(0, 200, 5)], "k string, v double, op string")
    a = sorted(map(tuple, incremental_agg(
        _agg(base), ch, ["k"], {"s": "v"}, "n_rows").collect()))
    b = sorted(map(tuple, incremental_agg(
        _agg(base.repartition(13)), ch.repartition(3), ["k"],
        {"s": "v"}, "n_rows").collect()))
    assert a == b


def test_unknown_op_fails_the_job(spark):
    base = _agg(spark.createDataFrame([("a", 1.0)], "k string, v double"))
    ch = spark.createDataFrame([("a", 1.0, "UPSERT")],
                               "k string, v double, op string")
    with pytest.raises(Exception, match="op must be 'I' or 'D'"):
        incremental_agg(base, ch, ["k"], {"s": "v"}, "n_rows").collect()


def test_empty_keys_rejected(spark):
    base = _agg(spark.createDataFrame([("a", 1.0)], "k string, v double"))
    with pytest.raises(ValueError):
        incremental_agg(base, base, [], {}, "n_rows")

"""robust_outliers: lower-median selection, MAD semantics, exact
integer-cents boundaries (r8: DECIMAL cast replaced by
round(value*100) BIGINT — no engine rounding-mode dependence)."""

from __future__ import annotations

import pytest

from bqetl_spark.functions.stats import robust_outliers


def _ro(spark, vals_by_key, k=3):
    rows = [(u, float(v), i)
            for u, vs in vals_by_key.items()
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["user_id", "value", "event_id"])
    return {r["user_id"]: (r["n_events"], r["median_cents"],
                           r["mad_cents"], r["n_outliers"])
            for r in robust_outliers(df, "value", "user_id",
                                     "event_id", k).collect()}


def test_median_mad_and_outlier_flagging(spark):
    # values 1..7 plus a wild 100: lower median of 8 values = 4th
    # smallest = 400 cents; deviations {300,200,100,0,100,200,300,9600}
    # sorted -> lower median (4th) = 200; outlier iff dev > 600 -> only 100
    got = _ro(spark, {1: [1, 2, 3, 4, 5, 6, 7, 100]})
    assert got[1] == (8, 400, 200, 1)


def test_lower_median_even_count(spark):
    # n=4 -> position (4+1) div 2 = 2 -> lower middle
    got = _ro(spark, {1: [10, 20, 30, 40]})
    assert got[1][1] == 2000


def test_mad_zero_flags_everything_different(spark):
    """Over half identical -> MAD 0: every differing value is an
    outlier (dev > 0), identical values are not (0 > 0 false) — the
    documented MAD caveat."""
    got = _ro(spark, {1: [5, 5, 5, 9]})
    assert got[1] == (4, 500, 0, 1)


def test_singleton_group(spark):
    got = _ro(spark, {1: [7]})
    assert got[1] == (1, 700, 0, 0)


def test_exact_boundary_not_outlier(spark):
    """dev == k*MAD exactly is NOT an outlier (strict >) — integer
    cents arithmetic makes the boundary exact, not float-fuzzy."""
    got = _ro(spark, {1: [0, 1, 2, 3, 5]})
    # median = 200, devs {200,100,0,100,300} sorted -> MAD (3rd) = 100
    # threshold 3*100 = 300: value 5 has dev 300 -> NOT outlier (strict)
    assert got[1] == (5, 200, 100, 0)


def test_round_nearest_cent_semantics(spark):
    """Sub-cent fractions round to the NEAREST cent: 1.239 -> 124,
    1.231 -> 123; and the classic float trap 0.29 (·100 =
    28.999999999999996) lands on 29, not floor's 28."""
    got = _ro(spark, {1: [1.239, 1.231, 1.231]})
    assert got[1][1] == 123  # lower median of {124, 123, 123}
    # values {124,123,123} -> lower median 123, devs sorted {0,0,1}
    # -> MAD (2nd) = 0 -> the differing 124 is an outlier
    assert got[1] == (3, 123, 0, 1)
    got2 = _ro(spark, {2: [0.29]})
    assert got2[2] == (1, 29, 0, 0)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0, 0)],
                               ["user_id", "value", "event_id"])
    with pytest.raises(ValueError):
        robust_outliers(df, k=0)

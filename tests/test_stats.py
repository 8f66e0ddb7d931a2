"""robust_outliers: lower-median selection, MAD semantics, exact
decimal boundaries."""

from __future__ import annotations

from decimal import Decimal

import pytest

from bqetl_spark.functions.stats import robust_outliers


def _ro(spark, vals_by_key, k=3):
    rows = [(u, float(v), i)
            for u, vs in vals_by_key.items()
            for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, ["user_id", "value", "event_id"])
    return {r["user_id"]: (r["n_events"], r["median"], r["mad"],
                           r["n_outliers"])
            for r in robust_outliers(df, "value", "user_id",
                                     "event_id", k).collect()}


def test_median_mad_and_outlier_flagging(spark):
    # values 1..7 plus a wild 100: lower median of 8 values = 4th
    # smallest = 4.00; deviations {3,2,1,0,1,2,3,96} sorted ->
    # lower median (4th) = 2.00; outlier iff dev > 6.00 -> only 100
    got = _ro(spark, {1: [1, 2, 3, 4, 5, 6, 7, 100]})
    assert got[1] == (8, Decimal("4.00"), Decimal("2.00"), 1)


def test_lower_median_even_count(spark):
    # n=4 -> position (4+1) div 2 = 2 -> lower middle
    got = _ro(spark, {1: [10, 20, 30, 40]})
    assert got[1][1] == Decimal("20.00")


def test_mad_zero_flags_everything_different(spark):
    """Over half identical -> MAD 0: every differing value is an
    outlier (dev > 0), identical values are not (0 > 0 false) — the
    documented MAD caveat."""
    got = _ro(spark, {1: [5, 5, 5, 9]})
    assert got[1] == (4, Decimal("5.00"), Decimal("0.00"), 1)


def test_singleton_group(spark):
    got = _ro(spark, {1: [7]})
    assert got[1] == (1, Decimal("7.00"), Decimal("0.00"), 0)


def test_exact_boundary_not_outlier(spark):
    """dev == k*MAD exactly is NOT an outlier (strict >) — decimal
    arithmetic makes the boundary exact, not float-fuzzy.
    values {0,1,2,3,10}: median 2, devs {2,1,0,1,8} -> MAD 1,
    3*MAD = 3... use a value at exactly dev 3: add 5 (dev 3)."""
    got = _ro(spark, {1: [0, 1, 2, 3, 5]})
    # median = 2, devs {2,1,0,1,3} sorted {0,1,1,2,3} -> MAD (3rd) = 1
    # threshold 3*1 = 3: value 5 has dev 3 -> NOT an outlier (strict)
    assert got[1] == (5, Decimal("2.00"), Decimal("1.00"), 0)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0, 0)],
                               ["user_id", "value", "event_id"])
    with pytest.raises(ValueError):
        robust_outliers(df, k=0)

"""basket_lift: exact-integer association-rule invariants."""

from __future__ import annotations

import pytest

from bqetl_spark.caching import release_pinned
from bqetl_spark.functions.stats import basket_lift

# baskets: {a,b} x3, {a,c} x1, {b,c} x1, {a,b,c} x1
BASKETS = [
    (1, "a"), (1, "b"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "b"),
    (4, "a"), (4, "c"),
    (5, "b"), (5, "c"),
    (6, "a"), (6, "b"), (6, "c"),
]


def _lifts(df):
    return {(r["item_a"], r["item_b"]): (r["n_pair"], r["lift_ppm"])
            for r in df.collect()}


def test_hand_computed_lift(spark):
    df = spark.createDataFrame(BASKETS, ["bk", "it"])
    got = _lifts(basket_lift(df, "bk", "it", min_baskets=1))
    release_pinned()
    # N=6; n_a=5, n_b=5, n_c=3; n_ab=4, n_ac=2, n_bc=2
    assert got[("a", "b")] == (4, 4 * 6 * 10**6 // (5 * 5))
    assert got[("a", "c")] == (2, 2 * 6 * 10**6 // (5 * 3))
    assert got[("b", "c")] == (2, 2 * 6 * 10**6 // (5 * 3))


def test_positive_and_negative_association(spark):
    """lift > 1e6 for items that co-occur more than independence
    predicts, < 1e6 for ones that avoid each other."""
    rows = [(i, "base") for i in range(30)]   # anchor in every basket
    rows += [(i, "x") for i in range(5)] + [(i, "y") for i in range(5)]
    rows += [(i, "u") for i in range(15)]      # u: baskets 0-14
    rows += [(i, "v") for i in range(10, 30)]  # v: 10-29, overlap 5/30
    df = spark.createDataFrame(rows, ["bk", "it"])
    got = _lifts(basket_lift(df, "bk", "it", min_baskets=1))
    release_pinned()
    # x,y: 5 co-occurrences out of 5x5 possible -> lift 6.0
    assert got[("x", "y")] == (5, 5 * 30 * 10**6 // (5 * 5))
    assert got[("x", "y")][1] > 10**6          # positive association
    # u,v overlap 5 vs independence 15*20/30 = 10 -> lift 0.5
    assert got[("u", "v")] == (5, 5 * 30 * 10**6 // (15 * 20))
    assert got[("u", "v")][1] < 10**6          # negative association


def test_size_guard_drops_whole_basket(spark):
    """A basket above max_items_per_basket contributes NOTHING — not
    its pairs, not its item frequencies, not the basket count."""
    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    jumbo = [(9, f"i{k}") for k in range(25)] + [(9, "a"), (9, "b")]
    df_small = spark.createDataFrame(small, ["bk", "it"])
    df_all = spark.createDataFrame(small + jumbo, ["bk", "it"])
    a = _lifts(basket_lift(df_small, "bk", "it", min_baskets=1))
    release_pinned()
    b = _lifts(basket_lift(df_all, "bk", "it", min_baskets=1,
                           max_items_per_basket=20))
    release_pinned()
    assert a == b


def test_duplicate_rows_count_once(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")], ["bk", "it"])
    got = _lifts(basket_lift(df, "bk", "it", min_baskets=1))
    release_pinned()
    assert got[("a", "b")] == (2, 2 * 2 * 10**6 // (2 * 2))


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["bk", "it"])
    with pytest.raises(ValueError, match="min_items"):
        basket_lift(df, "bk", "it", min_items=1)
    with pytest.raises(ValueError, match="min_baskets"):
        basket_lift(df, "bk", "it", min_baskets=0)

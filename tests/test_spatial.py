"""Grid-bucketed spatial neighbor join (operators/spatial.py, r12)."""

import pytest

from bqetl_spark.operators.spatial import grid_neighbor_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, ["id", "px", "py"])


def test_grid_neighbor_join_matches_bruteforce(spark):
    """Recall 1.0 pin: the banded result equals an exact all-pairs
    brute force on a random integer point set (cells can't miss a
    qualifying pair — |dx| <= r bounds the cell delta to 1)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, int(x), int(y)) for i, (x, y) in
            enumerate(rng.integers(0, 2000, size=(300, 2)))]
    r = 150
    got = {(q["id_a"], q["id_b"]): q["dist_sq"]
           for q in grid_neighbor_join(_pts(spark, rows), radius=r,
                                       max_cell_size=1000).collect()}
    want = {}
    for i, xa, ya in rows:
        for j, xb, yb in rows:
            if i < j:
                d = (xa - xb) ** 2 + (ya - yb) ** 2
                if d <= r * r:
                    want[(i, j)] = d
    assert got == want
    assert len(want) > 50  # non-trivial pair set


def test_grid_neighbor_join_cell_cap_and_validation(spark):
    """A cell holding more points than max_cell_size drops (the spatial
    boilerplate shield — bad-geocode pileups), while sparse cells still
    pair; radius < 1 raises."""
    crowd = [(i, 5, 5) for i in range(10)]          # one cell, 10 points
    sparse = [(100, 500, 500), (101, 503, 504)]
    out = grid_neighbor_join(_pts(spark, crowd + sparse), radius=10,
                             max_cell_size=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == {(100, 101)}
    with pytest.raises(ValueError, match="radius"):
        grid_neighbor_join(_pts(spark, sparse), radius=0)

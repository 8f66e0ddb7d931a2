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


def test_grid_knn_matches_bruteforce_and_truncates(spark):
    """kNN equals brute force for points with >= k in-radius neighbors;
    points with fewer return exactly their in-radius set (the
    radius-bounded contract); ranks are 1..n with id tie-breaks."""
    import numpy as np

    from bqetl_spark.operators.spatial import grid_knn_join

    rng = np.random.default_rng(23)
    rows = [(i, int(x), int(y)) for i, (x, y) in
            enumerate(rng.integers(0, 1000, size=(200, 2)))]
    r, k = 60, 3  # mean in-radius degree ~2.3: some truncate, some fill
    got = {}
    for q in grid_knn_join(_pts(spark, rows), radius=r, k=k,
                           max_cell_size=1000).collect():
        got.setdefault(q["id"], []).append(
            (q["rank"], q["neighbor_id"], q["dist_sq"]))
    want = {}
    for i, xa, ya in rows:
        nbrs = sorted(((xa - xb) ** 2 + (ya - yb) ** 2, j)
                      for j, xb, yb in rows
                      if j != i and (xa - xb) ** 2 + (ya - yb) ** 2
                      <= r * r)
        want[i] = [(rk + 1, j, d) for rk, (d, j) in
                   enumerate(nbrs[:k])]
    for i, _, _ in rows:
        assert sorted(got.get(i, [])) == want[i], i
    # at this density some point must have been truncated below k
    assert any(len(v) < k for v in want.values())
    assert any(len(v) == k for v in want.values())

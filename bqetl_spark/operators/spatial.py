"""Grid-bucketed spatial neighbor join (r12).

The scale pattern for "find all point pairs within radius r" without an
all-pairs join: bucket points into an r-sized grid, probe each point's
3×3 cell neighborhood with an EQUI-join on cell keys, then verify the
exact distance. Any qualifying pair lies in adjacent cells by
construction (|dx| ≤ r ⇒ cell_x differs by ≤ 1), so recall is 1.0 —
the pigeonhole argument of the Hamming-banding family, in geometry.

Reference repo has no spatial operator; this extends the engine the way
the dedup/ANN families do — candidate generation by bucketing, exact
verify, deterministic guards — because a training-data pipeline meets
the same shape in geo dedup (GPS-tagged images), location joins, and
any metric with a cheap cell decomposition.

Scale posture: one groupBy for cell occupancy, one equi-join on
(cell_x, cell_y) keys hash-partitioned across the cluster — never
quadratic in point count. Dense cells (a "null island" of bad
geocodes — the spatial boilerplate shield) are dropped
deterministically by ``max_cell_size`` BEFORE the join and the guard
replays in the SQL oracle as a HAVING. Each qualifying pair is
generated exactly ONCE (the probe side explodes to 9 neighbor keys;
the build side keeps its single home cell), so no distinct pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_join(points: DataFrame, radius: int,
                       max_cell_size: int = 64,
                       id_col: str = "id", x_col: str = "px",
                       y_col: str = "py") -> DataFrame:
    """All point pairs within EUCLIDEAN distance ``radius`` →
    ``(id_a, id_b, dist_sq)``, id_a < id_b, exact integer arithmetic
    (coordinates must be non-negative integers; dist_sq = dx²+dy² in
    BIGINT, no float anywhere — what makes the op value-oracle-able).

    Cell size = ``radius`` exactly: a pair within r has cell
    coordinates differing by at most 1 on each axis, so the 3×3
    neighborhood probe misses nothing. Cells holding more than
    ``max_cell_size`` points are dropped (both as probe homes and as
    build targets) before the join."""
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    ).withColumn("cx", F.expr(f"px div {int(radius)}")) \
     .withColumn("cy", F.expr(f"py div {int(radius)}"))
    ok = (pts.groupBy("cx", "cy").count()
          .filter(F.col("count") <= max_cell_size)
          .select("cx", "cy"))
    co = pts.join(ok, ["cx", "cy"])
    probe = (co.withColumn("dx", F.explode(F.sequence(F.lit(-1),
                                                      F.lit(1))))
             .withColumn("dy", F.explode(F.sequence(F.lit(-1),
                                                    F.lit(1))))
             .select(F.col("id").alias("id_a"),
                     F.col("px").alias("ax"), F.col("py").alias("ay"),
                     (F.col("cx") + F.col("dx")).alias("kx"),
                     (F.col("cy") + F.col("dy")).alias("ky")))
    build = co.select(F.col("id").alias("id_b"),
                      F.col("px").alias("bx"), F.col("py").alias("by"),
                      F.col("cx").alias("kx"), F.col("cy").alias("ky"))
    dist_sq = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
               + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    return (probe.join(build, ["kx", "ky"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dist_sq.alias("dist_sq"))
            .filter(F.col("dist_sq") <= radius * radius))


def grid_knn_join(points: DataFrame, radius: int, k: int = 3,
                  max_cell_size: int = 64,
                  id_col: str = "id", x_col: str = "px",
                  y_col: str = "py") -> DataFrame:
    """RADIUS-BOUNDED k-nearest-neighbors over the grid join →
    ``(id, neighbor_id, dist_sq, rank)``: for every point, its ``k``
    nearest neighbors among those within ``radius`` (Euclidean, exact
    BIGINT), rank 1 = closest, ties broken by neighbor id for
    determinism. Points with fewer than k in-radius neighbors return
    fewer rows — the practical geo-retrieval shape (a candidate cutoff
    radius always exists in production; UNBOUNDED kNN needs expanding
    ring search, the same cell machinery probed at growing radii —
    noted as the scale path, not built until an operator needs it).

    Shape: one :func:`grid_neighbor_join` (each qualifying pair once),
    symmetrized, then a per-point window top-k — the pair join's
    equi-key posture plus one rank shuffle on the point id."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    pairs = grid_neighbor_join(points, radius,
                               max_cell_size=max_cell_size,
                               id_col=id_col, x_col=x_col, y_col=y_col)
    sym = pairs.select(F.col("id_a").alias("id"),
                       F.col("id_b").alias("neighbor_id"),
                       "dist_sq") \
        .unionByName(pairs.select(F.col("id_b").alias("id"),
                                  F.col("id_a").alias("neighbor_id"),
                                  "dist_sq"))
    w = Window.partitionBy("id").orderBy("dist_sq", "neighbor_id")
    return (sym.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "neighbor_id", "dist_sq",
                    F.col("rank").cast("long").alias("rank")))

"""Z-order layout: key correctness + the data-skipping property it exists
for (parquet footer min/max per file tight in BOTH dimensions)."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bqetl_spark.operators.layout import write_zordered, zorder_key


def test_zorder_key_bit_interleave(spark):
    # x=0b101 (5), y=0b011 (3) -> interleaved (y_b x_b pairs, x at even
    # positions): bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0 -> 0b011011 = 27
    row = (spark.range(1)
           .select(zorder_key([F.lit(5), F.lit(3)], bits=3).alias("z"))
           .first())
    assert row["z"] == 27
    # interleave is symmetric in magnitude: key is monotone in each dim
    # when the other is fixed
    df = spark.createDataFrame([(x, 7) for x in range(16)], ["x", "y"])
    zs = [r["z"] for r in
          df.select(zorder_key(["x", "y"], bits=4).alias("z"))
          .orderBy("x").collect()]
    assert zs == sorted(zs)


def test_zorder_key_validations(spark):
    import pytest
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(["a"])
    with pytest.raises(ValueError, match="BIGINT"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        out.append((mn, mx))
    return out


def test_write_zordered_skips_files_in_both_dims(spark, tmp_path):
    """The point of the layout: a point-ish filter on EITHER interleaved
    column overlaps only a minority of files' min/max ranges, while a
    plain single-column sort leaves the other column scattered across
    every file."""
    n = 1 << 14
    df = (spark.range(n)
          .select((F.col("id") % 128).alias("a"),
                  F.floor(F.col("id") / 128).cast("long").alias("b")))

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ["a", "b"], bits=7, num_files=16)
    spath = str(tmp_path / "sorted_a")
    (df.repartitionByRange(16, "a").sortWithinPartitions("a")
     .write.mode("overwrite").parquet(spath))

    def mean_hit(path, col, vals=(16, 48, 64, 100)):
        # repartitionByRange SAMPLES to pick boundaries, so single-point
        # hit counts wobble run to run — average several interior probes
        rngs = _file_ranges(path, col)
        return sum(sum(1 for mn, mx in rngs if mn <= v <= mx)
                   for v in vals) / (len(rngs) * len(vals))

    # z-order: BOTH dimensions prune (ideal point hit ~ sqrt(files)/files
    # = 0.25; 0.7 leaves headroom for sampled-boundary wobble)
    assert mean_hit(zpath, "a") <= 0.7
    assert mean_hit(zpath, "b") <= 0.7
    # a-sorted layout: 'a' prunes perfectly but 'b' hits EVERY file for
    # every interior probe — the scattered dimension z-order exists to fix
    assert mean_hit(spath, "a") <= 0.3
    assert mean_hit(spath, "b") == 1.0
    assert mean_hit(zpath, "b") < mean_hit(spath, "b")
    # layout changes bytes on disk, never values
    assert (spark.read.parquet(zpath).orderBy("a", "b").collect()
            == df.orderBy("a", "b").collect())


def _xy2d(order, x, y):
    """Reference xy2d (canonical n-1 mirror) — independent of the
    engine implementation."""
    n = 1 << order
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_exhaustively(spark):
    from bqetl_spark.operators.layout import hilbert_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {(r["x"], r["y"]): r["h"]
           for r in df.select("x", "y", hilbert_key("x", "y", bits=4)
                              .alias("h")).collect()}
    assert got == {(x, y): _xy2d(4, x, y) for x, y in rows}


def test_hilbert_is_bijective_and_continuous(spark):
    """The defining curve properties on the full 16x16 grid: every cell
    gets a distinct index, and consecutive indices are GRID NEIGHBORS
    (Manhattan distance exactly 1) — the property Morton order lacks."""
    from bqetl_spark.operators.layout import hilbert_key, zorder_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    h = {r["h"]: (r["x"], r["y"])
         for r in df.select("x", "y", hilbert_key("x", "y", bits=4)
                            .alias("h")).collect()}
    assert len(h) == 256 and set(h) == set(range(256))
    steps = [abs(h[d][0] - h[d + 1][0]) + abs(h[d][1] - h[d + 1][1])
             for d in range(255)]
    assert all(s == 1 for s in steps)
    # Morton, by contrast, jumps: its max step on the same grid is > 1
    z = {r["z"]: (r["x"], r["y"])
         for r in df.select("x", "y", zorder_key(["x", "y"], bits=4)
                            .alias("z")).collect()}
    zsteps = [abs(z[d][0] - z[d + 1][0]) + abs(z[d][1] - z[d + 1][1])
              for d in range(255)]
    assert max(zsteps) > 1


def test_hilbert_range_blocks_have_tighter_boxes_than_morton(spark):
    """The layout claim itself: split the 32x32 grid into 16 contiguous
    key-range blocks (as range partitioning would); the mean bounding-
    box area over Hilbert blocks must be <= Morton's — tighter boxes
    are what turn into tighter parquet min/max stats."""
    from bqetl_spark.operators.layout import hilbert_key, zorder_key

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select("x", "y",
                    hilbert_key("x", "y", bits=5).alias("h"),
                    zorder_key(["x", "y"], bits=5).alias("z")).collect()

    def mean_box(key):
        blocks = {}
        for r in out:
            blocks.setdefault(r[key] // 64, []).append((r["x"], r["y"]))
        areas = []
        for pts in blocks.values():
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return sum(areas) / len(areas)

    assert mean_box("h") <= mean_box("z")


def test_hilbert_key_validations(spark):
    import pytest

    from bqetl_spark.operators.layout import hilbert_key

    with pytest.raises(ValueError, match="bits"):
        hilbert_key("a", "b", bits=0)
    with pytest.raises(ValueError, match="bits"):
        hilbert_key("a", "b", bits=32)

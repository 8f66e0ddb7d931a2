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

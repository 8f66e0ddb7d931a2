"""Data-layout operators for lake-scale scan pruning.

Z-ordering interleaves the bits of several key columns into one sort key,
so range-partitioning + sorting by it co-locates rows that are close in
ANY of the dimensions. Parquet then stores tight per-file and per-row-group
min/max for every one of those columns, and a filter on any single
dimension skips most files — the multi-column data-skipping trick
single-column sorting cannot give (sorting by A leaves B scattered, so
B-filters scan everything). At 100 TB this is the difference between a
full scan and touching a few percent of files for point-ish predicates.

The key is a pure integer expression (shifts/masks — whole-stage codegen,
reproducible in any engine), so the layout decision is testable with the
same differential rigor as a query: the gate hash-checks the computed key
against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-curve) key: interleave the low ``bits`` bits of each
    column. Columns must be non-negative integers (callers bucket or rank
    other types first); values are masked to ``bits`` bits, so the caller
    chooses the resolution/range trade-off. With k columns the key uses
    k*bits bits — keep k*bits <= 62 for a BIGINT key."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if not 2 <= k <= 4:
        raise ValueError(f"zorder_key interleaves 2-4 columns, got {k}")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed BIGINT")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 16, num_files: int | None = None) -> None:
    """Write ``df`` as parquet range-partitioned and sorted by the Z-key
    of ``cols``: each output file owns a contiguous Z-range, so its
    parquet min/max footer stats are tight in EVERY interleaved dimension
    and a reader's filter on any of them prunes files (verified in
    tests/test_layout.py via pyarrow footer stats). ``num_files`` defaults
    to the session's shuffle partitioning."""
    spark = df.sparkSession
    n = num_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    (keyed.repartitionByRange(n, "__zkey")
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))

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


def hilbert_key(xcol: Column | str, ycol: Column | str,
                bits: int = 8) -> Column:
    """Hilbert-curve key for two dimensions — the locality-preserving
    upgrade to :func:`zorder_key`: unlike Morton order, consecutive
    Hilbert indices are always GRID NEIGHBORS (no diagonal jumps across
    half the space), so range-partitioned files get strictly tighter
    per-file min/max boxes on both dimensions (the reason table formats
    offer Hilbert clustering alongside Z-order).

    Implementation: the canonical xy2d walk (per level: quadrant digit
    d += s²·((3·rx) XOR ry), then reflect-and-swap rotation with the
    n−1 mirror, which keeps every intermediate in [0, n)) expressed as
    a RUNTIME fold — ``F.aggregate`` over a ``bits``-element sequence
    with a (x, y, d) struct accumulator. A macro-unrolled column would
    multiply the expression tree ~5× per level (the rotation reads each
    coordinate twice); the fold keeps the plan O(1) and inside
    whole-stage codegen. Pure integer ops — reproduced exactly in the
    SQL oracle as a linear CTE chain.

    Inputs are masked to ``bits`` bits (same contract as zorder_key:
    callers bucket/rank other types first). The key uses 2·bits bits —
    bits ≤ 31 keeps it in a signed BIGINT."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = F.col(xcol) if isinstance(xcol, str) else xcol
    yc = F.col(ycol) if isinstance(ycol, str) else ycol
    n = 1 << bits
    init = F.struct(
        xc.cast("long").bitwiseAND(F.lit(n - 1)).alias("x"),
        yc.cast("long").bitwiseAND(F.lit(n - 1)).alias("y"),
        F.lit(0).cast("long").alias("d"))

    def step(acc, s):
        # fold runs over the literal level sizes s = 2^(bits-1) .. 1
        rx = F.when(acc["x"].bitwiseAND(s) != 0,
                    F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) != 0,
                    F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = (acc["d"] + s * s * (rx * F.lit(3)).bitwiseXOR(ry))
        x2 = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - acc["y"])
                    .otherwise(acc["y"])).otherwise(acc["x"])
        y2 = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - acc["x"])
                    .otherwise(acc["x"])).otherwise(acc["y"])
        return F.struct(x2.cast("long").alias("x"),
                        y2.cast("long").alias("y"),
                        d2.cast("long").alias("d"))

    levels = F.array(*[F.lit(1 << (bits - i)).cast("long")
                       for i in range(1, bits + 1)])
    return F.aggregate(levels, init, step, lambda acc: acc["d"])

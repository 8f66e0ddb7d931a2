"""As-of join — a time-series operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.time <= left.time`` within the same key (the classic
"latest-quote-for-trade" join). Out of reference parity scope (the
reference is batch-relational only, SURVEY.md §2.3); part of the
beyond-parity surface for event/time-series processing.

Spark-first implementation: the union trick — tag both sides, union, and
take ``last(right_payload, ignorenulls=True)`` over a window ordered by
(time, side) per key. One shuffle total (the window partitioning), no
per-key Python, no cross or range join blow-up. This is the shape that
scales: at N rows it is sort-within-partition after a single hash
exchange, O(N log N) per partition.

An alternative for very wide right payloads is bucketized range join +
filter; the union form wins when the payload fits in a struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its ``on`` time with the same ``by`` key (NULLs when none).

    ``right_cols``: right payload columns to attach (default: all except
    ``on``/``by``), each renamed ``{col}{suffix}``.

    Determinism: when several right rows share (by, on), the one latest in
    (on, *right_cols) order wins — callers needing a specific tie-break
    should pre-deduplicate the right side.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    payload = F.struct(*[F.col(c) for c in rcols])

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__p", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType))
    rhs = right.select(
        F.col(by), F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, on)],
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    ).select(*[F.col(c) for c in lhs.columns])  # align column order

    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal time → "at or before" holds
    w = (Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).drop("__side", "__p")
    for c in rcols:
        out = out.withColumn(f"{c}{suffix}", F.col("__m")[c])
    return out.drop("__m")

"""As-of join — a time-series operator Spark lacks natively.

For each left row, attach the nearest right row within the same key:
``backward`` (right.time <= left.time, the classic latest-quote-for-trade),
``forward`` (right.time >= left.time), or ``nearest`` (closer of the two,
ties to backward) — the direction set pandas ``merge_asof`` users expect.
Out of reference parity scope (the reference is batch-relational only,
SURVEY.md §2.3); part of the beyond-parity surface for event/time-series
processing.

Spark-first implementation: the union trick — tag both sides, union, and
take ``last(right_payload, ignorenulls=True)`` over a window ordered by
(time, side) per key. One shuffle total (the window partitioning), no
per-key Python, no cross or range join blow-up. This is the shape that
scales: at N rows it is sort-within-partition after a single hash
exchange, O(N log N) per partition. ``nearest`` runs two window passes
(ascending + descending) over the SAME unioned frame — same partitioning,
so the exchange is shared and only the sorts differ.

An alternative for very wide right payloads is bucketized range join +
filter; the union form wins when the payload fits in a struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_number(col: F.Column, dtype: str) -> F.Column:
    # distance arithmetic for `nearest`: timestamps via unix_micros (exact
    # long), numerics via double
    if dtype.startswith("timestamp"):
        return F.unix_micros(col)
    return col.cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              direction: str = "backward") -> DataFrame:
    """Left as-of join; ``direction`` in {backward, forward, nearest}.

    ``right_cols``: right payload columns to attach (default: all except
    ``on``/``by``), each renamed ``{col}{suffix}``. Rows with no admissible
    right row get NULLs.

    Determinism: when several right rows share (by, on), the one latest in
    (on, *right_cols) order wins — callers needing a specific tie-break
    should pre-deduplicate the right side. For ``nearest``, equidistant
    backward/forward matches resolve to backward.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    # __t rides along so `nearest` can compare distances to both candidates
    payload = F.struct(F.col(on).alias("__t"), *[F.col(c) for c in rcols])

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
    # right rows sort before left rows at equal time, so "at or before"
    # (resp. "at or after") includes the equal-time right row
    frame = (Window.partitionBy(by), Window.unboundedPreceding, Window.currentRow)
    w_back = (frame[0].orderBy(F.col(on).asc(), F.col("__side").asc())
              .rowsBetween(frame[1], frame[2]))
    w_fwd = (frame[0].orderBy(F.col(on).desc(), F.col("__side").asc())
             .rowsBetween(frame[1], frame[2]))

    if direction == "backward":
        filled = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w_back))
    elif direction == "forward":
        filled = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w_fwd))
    else:
        dtype = dict(left.dtypes)[on]
        filled = (unioned
                  .withColumn("__b", F.last("__p", ignorenulls=True).over(w_back))
                  .withColumn("__f", F.last("__p", ignorenulls=True).over(w_fwd)))
        t = _as_number(F.col(on), dtype)
        bt = _as_number(F.col("__b")["__t"], dtype)
        ft = _as_number(F.col("__f")["__t"], dtype)
        use_back = F.col("__b").isNotNull() & (
            F.col("__f").isNull() | ((t - bt) <= (ft - t)))
        filled = (filled.withColumn(
            "__m", F.when(use_back, F.col("__b")).otherwise(F.col("__f")))
            .drop("__b", "__f"))

    out = filled.filter(F.col("__side") == 1).drop("__side", "__p")
    for c in rcols:
        out = out.withColumn(f"{c}{suffix}", F.col("__m")[c])
    return out.drop("__m")

"""Bucketized range (interval) join.

Spark's optimizer turns a pure inequality join condition into a broadcast
nested loop or a cartesian product — O(N·M) at scale. The standard fix is to
quantize the range dimension into buckets, equi-join on the bucket id (plus
any equi keys), and re-apply the exact predicate: each left row only meets
right rows in the handful of buckets its interval spans.

``range_join_point``: left rows carry a point, right rows carry an
[lo, hi] interval; result pairs each point with every interval containing
it. Bucket width should be on the order of the typical interval length —
wider means fewer replicas per interval but more false candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_point(left: DataFrame, right: DataFrame, point: str,
                     lo: str, hi: str, bucket_width: int,
                     equi_keys: list[tuple[str, str]] | None = None) -> DataFrame:
    """Join left (point column) to right (interval [lo, hi], inclusive).

    All of ``point``/``lo``/``hi`` must be numeric (cast timestamps to epoch
    first). ``equi_keys``: optional extra (left_col, right_col) equality
    pairs that become part of the bucket join key.
    """
    w = F.lit(bucket_width)
    l = left.withColumn("__bl", F.floor(F.col(point) / w))
    # replicate each interval onto every bucket it overlaps
    r = right.withColumn(
        "__br", F.explode(F.sequence(F.floor(F.col(lo) / w),
                                     F.floor(F.col(hi) / w))))
    cond = l["__bl"] == r["__br"]
    for lc, rc in (equi_keys or []):
        cond = cond & (l[lc] == r[rc])
    out = (l.join(r, cond)
           .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))))
    return out.drop("__bl", "__br")

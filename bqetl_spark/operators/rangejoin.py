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


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                          bucket_width: int,
                          equi_keys: list[tuple[str, str]] | None = None) -> DataFrame:
    """Join rows whose intervals [l_lo, l_hi] and [r_lo, r_hi] overlap
    (inclusive endpoints: overlap iff l_lo <= r_hi AND r_lo <= l_hi).

    Same bucketization idea as ``range_join_point``, applied on BOTH sides:
    each interval replicates onto every bucket it spans, candidates meet on
    bucket equality, and the exact overlap predicate filters. A pair whose
    intervals overlap shares at least the bucket containing the overlap
    start, so recall is exact; duplicates from multi-bucket overlaps are
    removed by keeping only the candidate row where the join bucket equals
    that canonical first-overlap bucket (cheaper than a distinct — it's a
    row-local filter, no extra shuffle).

    At 100 TB the only shuffle is the bucket equi-join; replication factor
    is ~interval_length / bucket_width per side, the standard trade.
    """
    w = F.lit(bucket_width)
    l = left.withColumn(
        "__bl", F.explode(F.sequence(F.floor(F.col(l_lo) / w),
                                     F.floor(F.col(l_hi) / w))))
    r = right.withColumn(
        "__br", F.explode(F.sequence(F.floor(F.col(r_lo) / w),
                                     F.floor(F.col(r_hi) / w))))
    cond = l["__bl"] == r["__br"]
    for lc, rc in (equi_keys or []):
        cond = cond & (l[lc] == r[rc])
    overlap = (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
    # canonical bucket of a true pair: the bucket of max(l_lo, r_lo)
    first_bucket = F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / w)
    return (l.join(r, cond)
            .filter(overlap & (F.col("__bl") == first_bucket))
            .drop("__bl", "__br"))

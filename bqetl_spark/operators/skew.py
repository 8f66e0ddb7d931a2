"""Skew-aware join helpers.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one join key dominates so
hard that even split shuffle partitions overload (the classic hot-key fact
⋈ dim pattern at corpus scale).

``salted_join``: replicate the (small) right side ``salt`` ways and scatter
the left side's hot keys across the replicas — the shuffle then spreads a
hot key over ``salt`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, left_key: str,
                right_key: str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi join with ``salt``-way key scattering.

    The left side picks a deterministic pseudo-random salt from a hash of
    its entire row (so equal keys still spread); the right side is exploded
    to every salt value. Result equals a plain equi join; only the physical
    distribution changes. Right side grows ×salt — use for small-to-medium
    right sides with a skewed left.
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt_l", lsalt)
    r = (right.withColumn("__salt_r",
                          F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))))
    out = l.join(r, (l[left_key] == r[right_key]) &
                 (l["__salt_l"] == r["__salt_r"]), how)
    return out.drop("__salt_l", "__salt_r")

"""Robust statistics over grouped numeric columns.

Mean/stddev anomaly thresholds break down exactly when you need them
(the outliers inflate the stddev that is supposed to catch them); the
robust pair — median and MAD (median absolute deviation) — has a 50%
breakdown point and is the standard data-quality screen for pipeline
monitoring. Everything here is EXACT BIGINT arithmetic on integerized
cents (round(value*100) to the NEAREST integer) and position-selected
order statistics, so results replay bit-identically in a SQL oracle:
no float means, no transcendentals, and — unlike a double→DECIMAL cast
— no dependence on an engine's rounding convention (r7 driver hash
miss root cause: HALF_UP vs engine-version variance at the
DECIMAL(18,2) cast boundary). Round-to-NEAREST, not floor: cent-like
doubles put value*100 within ~1e-12 of an integer (0.29*100 =
28.999999999999996), so a floor decision sits in the float-noise band
while the nearest-integer decision has ~0.5 margin to its half-integer
boundary — tie-convention-independent, audited per SF in
tests/test_oracle_margins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_outliers(df: DataFrame, value_col: str = "value",
                    key_col: str = "user_id",
                    tiebreak_col: str = "event_id",
                    k: int = 3) -> DataFrame:
    """Per-group robust outlier counts: a row is an outlier when
    |x − median| > k · MAD, with median and MAD both LOWER medians
    (the value at 1-indexed position (n+1) div 2 of the sorted
    multiset — deterministic for any tie order because selection
    depends only on the multiset).

    Values are integerized to cents up front — CAST(round(x·100) AS
    BIGINT), nearest integer — so every comparison downstream is exact
    integer arithmetic whose one float decision carries ~0.5 margin
    (audited in tests/test_oracle_margins.py), independent of any
    engine's tie or cast convention.

    Groups with MAD = 0 (over half the values identical, or n = 1)
    flag every value different from the median — the textbook MAD
    caveat, kept rather than papered over (a modified z-score needs a
    float consistency constant; this stays integer-exact).

    Shape: two window passes (rank for the median selection, then rank
    over |x − med| for MAD) and two broadcast-joinable per-group
    medians — the same one-shuffle-per-selection bill as
    median_quantity, paid twice. Returns
    (key, n_events BIGINT, median_cents BIGINT, mad_cents BIGINT,
    n_outliers BIGINT).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.round(F.col(value_col).cast("double") * F.lit(100.0), 0).cast("long")
    base = (df.select(F.col(key_col).alias("__k"), v.alias("__v"),
                      F.col(tiebreak_col).alias("__t"))
            .filter(F.col("__v").isNotNull()))
    wn = Window.partitionBy("__k")
    wr = Window.partitionBy("__k").orderBy("__v", "__t")
    med = (base.withColumn("__n", F.count("*").over(wn))
           .withColumn("__r", F.row_number().over(wr))
           .filter(F.col("__r") == F.expr("(__n + 1) div 2"))
           .select("__k", F.col("__v").alias("__med")))
    dev = (base.join(med, "__k")
           .withColumn("__d", F.abs(F.col("__v") - F.col("__med"))))
    wd = Window.partitionBy("__k").orderBy("__d", "__v", "__t")
    mad = (dev.withColumn("__n", F.count("*").over(wn))
           .withColumn("__r", F.row_number().over(wd))
           .filter(F.col("__r") == F.expr("(__n + 1) div 2"))
           .select("__k", F.col("__d").alias("__mad")))
    flagged = (dev.join(mad, "__k")
               .withColumn("__out",
                           (F.col("__d") > F.lit(k) * F.col("__mad"))
                           .cast("int")))
    return (flagged.groupBy("__k")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.max("__med").alias("median_cents"),
                 F.max("__mad").alias("mad_cents"),
                 F.sum("__out").cast("long").alias("n_outliers"))
            .withColumnRenamed("__k", key_col))

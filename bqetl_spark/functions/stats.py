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


def basket_lift(df: DataFrame, basket_col: str, item_col: str,
                min_baskets: int = 2, min_items: int = 2,
                max_items_per_basket: int = 20) -> DataFrame:
    """Association-rule mining's core table: for every unordered item
    pair co-occurring in a basket, support counts and the LIFT ratio
    lift(a,b) = P(ab)/(P(a)·P(b)) — the classic market-basket signal
    (and, over (document, token) pairs, a term-association miner).

    All-integer formulation: with N baskets, n_a/n_b item frequencies
    (distinct baskets containing the item) and n_ab the pair frequency,

        lift_ppm = floor(n_ab · N · 10⁶ / (n_a · n_b))

    evaluated in DECIMAL (Spark) / HUGEINT (oracle) — no float, exact
    at any corpus size while counts stay < 10¹².

    Shape (the copurchase_edges discipline): one shuffle on the basket
    key builds the sorted distinct-item array; pair expansion is
    MAP-ONLY via nested transform/slice over the sorted array — already
    canonical a < b, no self-join. Quadratic-expansion guard: baskets
    outside [min_items, max_items_per_basket] are dropped ENTIRELY
    (drop-don't-truncate, oracle-replayable). Item frequencies n_a come
    from the SAME guarded baskets, so P(a) and P(ab) live on one sample
    space and lift is well-defined. ``min_baskets`` prunes the output
    pair table before the frequency joins. Returns
    (item_a, item_b, n_pair, lift_ppm).
    """
    if not 2 <= min_items <= max_items_per_basket:
        raise ValueError("need 2 <= min_items <= max_items_per_basket")
    if min_baskets < 1:
        raise ValueError(f"min_baskets must be >= 1, got {min_baskets}")
    from bqetl_spark.caching import pin

    bi = (df.select(F.col(basket_col).alias("__bk"),
                    F.col(item_col).alias("__it")).distinct())
    arrs = pin(bi.groupBy("__bk")
               .agg(F.sort_array(F.collect_list("__it")).alias("__is"))
               .filter((F.size("__is") >= min_items)
                       & (F.size("__is") <= max_items_per_basket)))
    n_baskets = arrs.count()  # metadata scalar
    freq = (arrs.select(F.explode("__is").alias("__it"))
            .groupBy("__it").agg(F.count("*").alias("__n")))
    pair = F.explode(F.expr(
        """flatten(transform(__is, (x, i) ->
               transform(slice(__is, i + 2, size(__is)),
                         y -> struct(x AS a, y AS b))))"""))
    pairs = (arrs.select(pair.alias("p")).select("p.a", "p.b")
             .groupBy("a", "b").agg(F.count("*").alias("n_pair"))
             .filter(F.col("n_pair") >= min_baskets))
    fa = freq.select(F.col("__it").alias("a"), F.col("__n").alias("__na"))
    fb = freq.select(F.col("__it").alias("b"), F.col("__n").alias("__nb"))
    lift = F.expr(f"""
        (CAST(n_pair AS DECIMAL(13,0)) * CAST({n_baskets} AS DECIMAL(13,0))
         * CAST(1000000 AS DECIMAL(7,0)))
        div (CAST(__na AS DECIMAL(13,0)) * CAST(__nb AS DECIMAL(13,0)))""")
    return (pairs.join(fa, "a").join(fb, "b")
            .select(F.col("a").alias("item_a"), F.col("b").alias("item_b"),
                    F.col("n_pair").cast("long").alias("n_pair"),
                    lift.cast("long").alias("lift_ppm")))

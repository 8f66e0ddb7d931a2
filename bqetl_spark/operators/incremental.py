"""Incremental aggregate maintenance (materialized-view delta folding).

The warehouse pattern the reference's daily-truncate-reload sidesteps: keep
a stored per-key aggregate table current by folding a CDC changelog
(inserts + deletes) into it — ONE pass over the changes, the base table is
never rescanned. SUM/COUNT are self-maintainable aggregates (a delete is a
subtraction), which is why every IVM engine supports exactly this family
first.

Exactness discipline: counts are BIGINT; sums run in DECIMAL (exact,
order-independent partial aggregation), so the maintained table is
bit-identical to a full recompute — the property the driver gate
hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_agg(base_agg: DataFrame, changes: DataFrame,
                    keys: list[str],
                    sum_specs: dict[str, str] | None = None,
                    count_col: str = "n_rows",
                    op_col: str = "op") -> DataFrame:
    """Fold a changelog into a stored per-key aggregate.

    ``base_agg``: the stored aggregate — one row per key with
    ``count_col`` (BIGINT row count) and one DECIMAL sum column per entry
    of ``sum_specs`` (out_name → source column it summed; the out_name
    columns must exist in base_agg).
    ``changes``: raw rows plus ``op_col`` ∈ {'I','D'} — 'D' rows must be
    (copies of) rows currently contributing to the base, the standard CDC
    contract; the fold cannot validate that without rescanning the base,
    so a bad delete silently under-counts exactly as it would in any IVM
    engine.

    Shape: ONE aggregation over the changes (map-side combined, shuffles
    |distinct changed keys| rows) + ONE full-outer join against the base
    on the key. At 100 TB the base is big and the delta is small — the
    join's base side is untouched-by-scan except the join itself, and a
    daily pipeline would bucket both sides on the key to make it
    shuffle-free. Keys whose maintained count reaches 0 drop out of the
    table (the group no longer exists), matching the recompute.

    Returns the maintained aggregate with the same columns as base_agg.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    sum_specs = sum_specs or {}
    # the error branch is INSIDE the sign expression the aggregation
    # evaluates, so an unknown op value fails the job executor-side — it
    # cannot be column-pruned away, and it cannot silently fold as an
    # insert
    sign = (F.when(F.col(op_col) == "D", F.lit(-1))
            .when(F.col(op_col) == "I", F.lit(1))
            .otherwise(F.raise_error(F.concat(
                F.lit("incremental_agg: op must be 'I' or 'D', got "),
                F.coalesce(F.col(op_col), F.lit("NULL")))).cast("int")))
    aggs = [F.sum(sign).alias("__dn")]
    for out, src in sum_specs.items():
        aggs.append(F.sum(sign.cast("decimal(18,2)")
                          * F.col(src).cast("decimal(18,2)"))
                    .alias(f"__d_{out}"))
    delta = changes.groupBy(*keys).agg(*aggs)
    joined = base_agg.join(delta, keys, "full")
    out_cols = [F.coalesce(F.col(count_col), F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))]
    maintained = joined.select(
        *keys,
        out_cols[0].cast("long").alias(count_col),
        *[(F.coalesce(F.col(out).cast("decimal(18,2)"),
                      F.lit(0).cast("decimal(18,2)"))
           + F.coalesce(F.col(f"__d_{out}"),
                        F.lit(0).cast("decimal(18,2)")))
          .alias(out) for out in sum_specs])
    return maintained.filter(F.col(count_col) > 0)

"""Upsert / changeset application without a table format.

Delta/Iceberg MERGE INTO is the right tool when those formats are on the
classpath; this is the format-agnostic emulation (changeset ∪ anti-joined
base) plus SCD2 interval construction. Both are pure DataFrame ops — the
upsert is one shuffle on the key (or none, when base and changeset are
bucketed on it — see sources.bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply a changeset: rows in ``changes`` replace same-key rows in
    ``base``; unmatched base rows pass through. Schemas must match.
    (MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.)"""
    if set(base.columns) != set(changes.columns):
        raise ValueError("upsert requires identical schemas; got "
                         f"{sorted(set(base.columns) ^ set(changes.columns))}")
    kept = base.join(changes.select(key), on=key, how="left_anti")
    return kept.unionByName(changes)


def merge_into(spark, target_path: str, changes: DataFrame, key: str,
               fmt: str = "auto") -> DataFrame:
    """MERGE INTO a stored table: Delta's native transactional merge when
    the package + table format are present, else a read-merge-rewrite with
    identical row semantics (``upsert`` above).

    - ``fmt="delta"``: require Delta; raise ImportError without the package.
    - ``fmt="auto"``: use Delta iff importable AND target is a Delta table.
    - ``fmt="parquet"``: force the emulation.

    At scale the Delta path is the real answer (transactional, file-level
    pruning on the merge condition); the emulation rewrites the whole
    table, which is the unavoidable cost without a table format's commit
    protocol. Returns the post-merge table as a DataFrame.
    """
    delta_tables = None
    if fmt in ("auto", "delta"):
        try:
            from delta.tables import DeltaTable as delta_tables
        except ImportError:
            if fmt == "delta":
                raise ImportError(
                    "fmt='delta' needs the delta-spark package "
                    "(pip install delta-spark; spark.sql.extensions="
                    "io.delta.sql.DeltaSparkSessionExtension)")
    if delta_tables is not None and delta_tables.isDeltaTable(spark, target_path):
        (delta_tables.forPath(spark, target_path).alias("t")
         .merge(changes.alias("s"), f"t.{key} = s.{key}")
         .whenMatchedUpdateAll()
         .whenNotMatchedInsertAll()
         .execute())
        return spark.read.format("delta").load(target_path)

    base = spark.read.parquet(target_path)
    merged = upsert(base, changes, key)
    # materialize off the source files before overwriting them (local
    # checkpoint is fine here: the emulation is the single-node/test path,
    # a real deployment uses the Delta branch)
    from bqetl_spark.caching import ckpt
    merged = ckpt(merged)
    merged.write.mode("overwrite").parquet(target_path)
    return spark.read.parquet(target_path)


def scd2_intervals(events: DataFrame, key: str, time_col: str,
                   attr_cols: list[str],
                   tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Build slowly-changing-dimension (type 2) validity intervals from an
    event/change log: one row per (key, change), valid from its own
    timestamp until the next change for the same key (NULL = still
    current). One window shuffle on the key. ``tiebreak_cols`` make the
    ordering total when timestamps can collide."""
    order = [time_col] + (tiebreak_cols or [])
    w = Window.partitionBy(key).orderBy(*order)
    return events.select(
        key, *attr_cols,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w).alias("valid_to"),
    )


def reconcile(old: DataFrame, new: DataFrame, key: str,
              compare_cols: list[str] | None = None) -> DataFrame:
    """Snapshot diff: full-outer join two versions of a table on ``key``
    and classify every key as added / removed / changed / unchanged.

    ``compare_cols`` limits the change detection (default: all shared
    non-key columns). NULL-safe comparison (``eqNullSafe``) so NULL→value
    and value→NULL count as changes. One shuffle on the key (or none when
    both sides are bucketed on it); the classification is a row-local
    projection, so reconciling two 100 TB snapshots costs exactly the
    full-outer join.

    Output: (key, status) plus ``old_<c>`` / ``new_<c>`` for each compared
    column.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c != key and c in set(new.columns)]
    # presence flags attached BEFORE the join: a compared column being
    # all-null after a full outer can't distinguish a missing row from a
    # present-but-null row
    o = (old.select(key, *[F.col(c).alias(f"old_{c}") for c in compare_cols])
         .withColumn("__in_old", F.lit(True)))
    n = (new.select(key, *[F.col(c).alias(f"new_{c}") for c in compare_cols])
         .withColumn("__in_new", F.lit(True)))
    joined = o.join(n, on=key, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (F.when(F.col("__in_old").isNull(), "added")
              .when(F.col("__in_new").isNull(), "removed")
              .when(same, "unchanged")
              .otherwise("changed"))
    return (joined
            .select(key, status.alias("status"),
                    *[F.col(f"old_{c}") for c in compare_cols],
                    *[F.col(f"new_{c}") for c in compare_cols]))


def point_in_time_join(facts: DataFrame, dim: DataFrame, key: str,
                       ts_col: str, valid_from: str = "valid_from",
                       valid_to: str = "valid_to",
                       how: str = "left") -> DataFrame:
    """AS-OF-time dimension lookup: each fact row joined to the dim
    version valid at its timestamp (``valid_from <= ts < valid_to``,
    NULL ``valid_to`` = still current) — the point-in-time-correct
    enrichment that prevents feature leakage when joining facts to a
    slowly-changing dimension (the consumer of :func:`scd2_intervals`).

    Scale shape: the join is an EQUI join on the key with the interval
    test as a residual predicate — an ordinary key-shuffle (or broadcast)
    join, never a range-join row blowup. When the dim's intervals
    partition time per key (scd2_intervals guarantees it, zero-width
    intervals from timestamp ties match nothing), at most one version
    matches per fact row.

    Fact columns keep their names; dim columns are suffixed nothing —
    callers select/alias; the validity bounds are dropped from the output.
    """
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = ((F.col(f"__f.{key}") == F.col(f"__d.{key}")) &
            (F.col(f"__f.{ts_col}") >= F.col(f"__d.{valid_from}")) &
            (F.col(f"__d.{valid_to}").isNull() |
             (F.col(f"__f.{ts_col}") < F.col(f"__d.{valid_to}"))))
    dim_cols = [c for c in dim.columns if c not in (key, valid_from, valid_to)]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in dim_cols])


def compact_changelog(changes: DataFrame, key: str, ts_col: str,
                      tiebreak_cols: list[str] | None = None) -> DataFrame:
    """CDC/changelog compaction: keep each key's LATEST row by event time
    (ties broken by ``tiebreak_cols`` so the winner is total-ordered) —
    the standard step that turns an append-only change stream into a
    current-state snapshot before serving or merging downstream.

    One window shuffle on the key; at 100 TB a hot key concentrates its
    changes on one reducer, but the retained payload per key is a single
    row and the window ranks a compact (ts, tiebreaks) tuple — the same
    posture as dedup_keep_best. Deterministic for any partitioning when
    the ordering is total."""
    order = [F.col(ts_col).desc()] + \
        [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))

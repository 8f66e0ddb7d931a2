"""Tracked persistence for operator-internal intermediates.

Several operators persist compact intermediate tables (banded MinHash
signatures, candidate pairs, IVF assignments) because a self-join would
otherwise recompute the expensive subplan once per join side. Those
DataFrames outlive the operator call — the caller materializes the returned
plan later — so the operator itself can never safely ``unpersist()``.

In a process-per-query harness (the driver, pytest) that is fine: executor
storage dies with the session. In a long-lived 100 TB session it pins
executor storage until the JVM GCs the DataFrame. ``pin()`` therefore
tracks every operator-internal persist in a module registry and
``release_pinned()`` frees them all — call it after materializing an
operator's output (bench.py does, between timed queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and track it for later release."""
    df = df.persist()
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every tracked intermediate; returns how many were freed.

    Safe to call at any time — operators re-persist on their next call.
    """
    n = len(_PINNED)
    while _PINNED:
        try:
            _PINNED.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
    return n

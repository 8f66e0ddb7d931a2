"""dense_hourly_counts: gap filling semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bqetl_spark.operators.timeseries import dense_hourly_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, hh, mm), t)
         for i, (hh, mm, t) in enumerate(rows)],
        ["event_id", "ts", "event_type"])


def test_gaps_read_zero_and_span_is_dense(spark):
    ev = _ev(spark, [(0, 5, "a"), (0, 10, "b"), (3, 0, "a")])
    got = {(r["hour_epoch"], r["event_type"]): r["n_events"]
           for r in dense_hourly_counts(ev).collect()}
    h0 = int(dt.datetime(2024, 1, 1, 0, 0,
                         tzinfo=dt.timezone.utc).timestamp())
    # 4 hours x 2 types, every cell present
    assert len(got) == 8
    assert got[(h0, "a")] == 1 and got[(h0, "b")] == 1
    assert got[(h0 + 3600, "a")] == 0      # the gap reads 0
    assert got[(h0 + 3 * 3600, "a")] == 1
    assert got[(h0 + 3 * 3600, "b")] == 0  # type never seen that hour


def test_single_hour_span(spark):
    ev = _ev(spark, [(2, 15, "x"), (2, 45, "x")])
    got = dense_hourly_counts(ev).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_empty_input(spark):
    ev = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, event_type string")
    assert dense_hourly_counts(ev).count() == 0

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


def test_funnel_strict_ordering(spark, tmp_path, monkeypatch):
    """A view at the SAME microsecond as the click does not advance the
    funnel (strict >); one microsecond later does."""
    import datetime as dt

    import __spark_entry__ as em

    def mk(rows):
        d = str(tmp_path / f"f{len(rows)}")
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        return d

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0, 500000)
    same = mk([(1, t0, 1, "click", 0.0, "{}"),
               (2, t0, 1, "view", 0.0, "{}")])
    got = {r["stage"]: r["n_users"]
           for r in em.queries()["funnel_stages"](spark, same).collect()}
    assert got == {"1_click": 1, "2_view_after_click": 0,
                   "3_purchase_after_view": 0}
    later = mk([(1, t0, 1, "click", 0.0, "{}"),
                (2, t0 + dt.timedelta(microseconds=1), 1, "view", 0.0, "{}"),
                (3, t0 + dt.timedelta(seconds=5), 1, "purchase", 0.0, "{}")])
    got = {r["stage"]: r["n_users"]
           for r in em.queries()["funnel_stages"](spark, later).collect()}
    assert got == {"1_click": 1, "2_view_after_click": 1,
                   "3_purchase_after_view": 1}


def test_retention_offsets(spark, tmp_path):
    """User active in weeks {0, 2} of their cohort appears at offsets 0
    and 2 only; a second user's cohort is independent."""
    import datetime as dt

    import __spark_entry__ as em

    base = dt.datetime(2024, 1, 4)  # mid-epoch-week, avoids boundary
    rows = [(1, base, 1, "click", 0.0, "{}"),
            (2, base + dt.timedelta(weeks=2), 1, "view", 0.0, "{}"),
            (3, base + dt.timedelta(weeks=1), 2, "click", 0.0, "{}")]
    d = str(tmp_path / "ret")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {(r["cohort_week"] - min(
        rr["cohort_week"] for rr in
        em.queries()["retention_cohorts"](spark, d).collect()),
            r["week_offset"]): r["n_users"]
           for r in em.queries()["retention_cohorts"](spark, d).collect()}
    # user1 cohort week W: offsets 0 and 2; user2 cohort W+1: offset 0
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_hour_epoch_is_bigint(spark):
    """ADVICE r5: F.lit(int < 2^31) creates IntegerType, so the grid's
    hour_epoch was INT (contract says BIGINT) and would silently flip to
    LONG past 2038. The bounds are now cast explicitly."""
    ev = _ev(spark, [(0, 5, "a"), (1, 0, "a")])
    schema = {f.name: f.dataType.simpleString()
              for f in dense_hourly_counts(ev).schema.fields}
    assert schema["hour_epoch"] == "bigint"
    assert schema["n_events"] == "bigint"


def test_longest_increasing_run_semantics(spark):
    """r6 applyInPandas exemplar: strict increase, (ts, event_id) order,
    NULL breaks and is its own singleton run."""
    import datetime as dt

    from bqetl_spark.operators.timeseries import longest_increasing_run

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 1,2,3 then drop, then 5 -> longest 3
        (1, base, 1, 1.0), (2, base + dt.timedelta(1), 1, 2.0),
        (3, base + dt.timedelta(2), 1, 3.0),
        (4, base + dt.timedelta(3), 1, 0.5),
        (5, base + dt.timedelta(4), 1, 5.0),
        # user 2: equal values never increase -> longest 1
        (6, base, 2, 7.0), (7, base + dt.timedelta(1), 2, 7.0),
        # user 3: NULL in the middle breaks both sides
        (8, base, 3, 1.0), (9, base + dt.timedelta(1), 3, None),
        (10, base + dt.timedelta(2), 3, 2.0),
        (11, base + dt.timedelta(3), 3, 3.0),
        # user 4: same ts -> event_id tiebreak (4,5 in id order = run 2)
        (12, base, 4, 4.0), (13, base, 4, 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["user_id"]: (r["longest_run"], r["n_events"])
           for r in longest_increasing_run(ev).collect()}
    assert got == {1: (3, 5), 2: (1, 2), 3: (2, 4), 4: (2, 2)}


def test_increasing_run_default_is_catalyst(spark):
    """r7: the default longest_increasing_run is the pure-window
    gaps-and-islands plan — no Python evaluation anywhere in it (the
    grouped-map variant moved to longest_increasing_run_grouped_map)."""
    from bqetl_spark.operators.timeseries import longest_increasing_run

    ev = _ev(spark, [(0, 1, "a"), (1, 2, "a")]).selectExpr(
        "event_id", "ts", "event_id % 2 AS user_id",
        "CAST(event_id AS DOUBLE) AS value")
    plan = longest_increasing_run(ev)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "PythonEval" not in plan and "ArrowEval" not in plan


def test_increasing_run_grouped_map_matches_default(spark):
    """The applyInPandas API exemplar must agree with the Catalyst
    default — including int64 values above 2^53 where a float64 cast
    would collapse strict increases (ADVICE r6)."""
    import datetime as dt

    from bqetl_spark.operators.timeseries import (
        longest_increasing_run, longest_increasing_run_grouped_map)

    base = dt.datetime(2024, 1, 1)
    big = 2 ** 53
    rows = [
        # consecutive int64 above 2^53: equal as doubles, increasing as ints
        (1, base, 1, big), (2, base + dt.timedelta(1), 1, big + 1),
        (3, base + dt.timedelta(2), 1, big + 2),
        (4, base + dt.timedelta(3), 1, big),
        # nulls and ties
        (5, base, 2, 10), (6, base + dt.timedelta(1), 2, None),
        (7, base + dt.timedelta(2), 2, 11),
        (8, base + dt.timedelta(3), 2, 12),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value long")
    want = {r["user_id"]: (r["longest_run"], r["n_events"])
            for r in longest_increasing_run(ev).collect()}
    got = {r["user_id"]: (r["longest_run"], r["n_events"])
           for r in longest_increasing_run_grouped_map(ev).collect()}
    assert want == got == {1: (3, 4), 2: (2, 4)}


# --------------------------------------------- event_pattern_match (r7) --

def _pev(spark, rows):
    """rows: (user, minute, type) -> events DF with deterministic ids."""
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 0, m), t)
         for i, (u, m, t) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"])


def _epm(ev, pattern):
    from bqetl_spark.operators.timeseries import event_pattern_match
    alpha = {"view": "v", "click": "c", "purchase": "p"}
    return {r["user_id"]: (r["n_events"], r["n_matches"])
            for r in event_pattern_match(ev, pattern, alpha).collect()}


def test_pattern_counts_and_order(spark):
    ev = _pev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "click"), (1, 3, "purchase"),
        (1, 4, "view"), (1, 5, "purchase"),            # vccp + vp = 2
        (2, 0, "purchase"), (2, 1, "view"),            # pv: no match
        (3, 0, "view"),                                # v alone: no match
    ])
    got = _epm(ev, "vc*p")
    assert got == {1: (6, 2), 2: (2, 0), 3: (1, 0)}


def test_pattern_non_overlapping_semantics(spark):
    """'pp' over 'ppp' counts ONE non-overlapping match — the leftmost
    scan consumes matched chars (same in Java regex and RE2)."""
    ev = _pev(spark, [(1, m, "purchase") for m in range(3)])
    assert _epm(ev, "pp")[1] == (3, 1)


def test_pattern_tiebreak_on_equal_ts(spark):
    """Two events at the SAME timestamp order by event_id — the
    deterministic total order the oracle's string_agg uses."""
    rows = [(0, 1, dt.datetime(2024, 1, 1), "view"),
            (1, 1, dt.datetime(2024, 1, 1), "purchase")]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts",
                                      "event_type"])
    assert _epm(ev, "vp")[1] == (2, 1)


def test_pattern_unknown_type_gets_other_code(spark):
    ev = _pev(spark, [(1, 0, "view"), (1, 1, "weird"), (1, 2, "purchase")])
    # unknown type breaks the direct vp adjacency ('vxp')
    assert _epm(ev, "vp")[1] == (3, 0)
    assert _epm(ev, "vxp")[1] == (3, 1)


def test_pattern_validation(spark):
    import pytest
    from bqetl_spark.operators.timeseries import event_pattern_match
    ev = _pev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        event_pattern_match(ev, "", {"view": "v"})
    with pytest.raises(ValueError):
        event_pattern_match(ev, "v", {"view": "vv"})
    with pytest.raises(ValueError):
        event_pattern_match(ev, "v", {"view": "v", "click": "v"})


# ----------------------------------------- attribution_multitouch (r7) --

def _att(spark, rows, window_sec=3600):
    from bqetl_spark.operators.timeseries import attribution_multitouch
    df = spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 0, 0, s), t)
         for i, (u, s, t) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"])
    return {(r["conv_id"], r["touch_id"]): (r["n_touches"], r["credit_ppm"])
            for r in attribution_multitouch(df, window_sec).collect()}


def test_attribution_u_shape_credits(spark):
    # user 1: clicks at 1,2,3,4s then purchase at 10s -> 40/ 6.6/ 6.6/ 40
    rows = [(1, 1, "click"), (1, 2, "click"), (1, 3, "click"),
            (1, 4, "click"), (1, 10, "purchase")]
    got = _att(spark, rows)
    # event ids are positional: clicks 0..3, purchase 4
    assert got == {(4, 0): (4, 400000), (4, 1): (4, 100000),
                   (4, 2): (4, 100000), (4, 3): (4, 400000)}


def test_attribution_small_n_rules(spark):
    one = _att(spark, [(1, 1, "click"), (1, 5, "purchase")])
    assert one == {(1, 0): (1, 1000000)}
    two = _att(spark, [(1, 1, "click"), (1, 2, "click"),
                       (1, 5, "purchase")])
    assert two == {(2, 0): (2, 500000), (2, 1): (2, 500000)}


def test_attribution_window_and_order_boundaries(spark):
    """A click AT the conversion instant is excluded (strictly before);
    a click exactly window_sec earlier is included (>= lower bound)."""
    rows = [(1, 0, "click"), (1, 10, "click"), (1, 10, "purchase")]
    got = _att(spark, rows, window_sec=10)
    # click id 1 at t=10 == purchase time -> excluded; click id 0 at
    # t=0 == ct - window -> included
    assert got == {(2, 0): (1, 1000000)}


def test_attribution_validation(spark):
    import pytest
    from bqetl_spark.operators.timeseries import attribution_multitouch
    df = spark.createDataFrame(
        [(0, 1, dt.datetime(2024, 1, 1), "click")],
        ["event_id", "user_id", "ts", "event_type"])
    with pytest.raises(ValueError):
        attribution_multitouch(df, 0)


def test_event_pattern_extract_positions(spark):
    """r8 MATCH_RECOGNIZE one-row-per-match: positions and lengths from
    the extract/split pair — 'evccpvpxx' -> conv matches at (2,4) and
    (6,2); err at (1,1)."""
    import datetime

    from bqetl_spark.operators.timeseries import event_pattern_extract

    types = ["error", "view", "click", "click", "purchase", "view",
             "purchase", "other", "other"]
    rows = [(1, datetime.datetime(2024, 1, 1, 0, 0, i), i, t)
            for i, t in enumerate(types)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id",
                                      "event_type"])
    alpha = {"view": "v", "click": "c", "purchase": "p",
             "signup": "s", "error": "e"}
    got = sorted((r["pattern"], r["match_no"], r["start_pos"],
                  r["match_len"])
                 for r in event_pattern_extract(
                     df, {"conv": "vc*p", "err": "e+"}, alpha).collect())
    assert got == [("conv", 1, 2, 4), ("conv", 2, 6, 2),
                   ("err", 1, 1, 1)]


def test_event_pattern_extract_no_match_no_rows(spark):
    import datetime

    from bqetl_spark.operators.timeseries import event_pattern_extract

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 0, "view")],
        ["user_id", "ts", "event_id", "event_type"])
    out = event_pattern_extract(df, {"conv": "vc*p"}, {"view": "v"})
    assert out.count() == 0


def test_event_pattern_extract_validation(spark):
    import datetime

    import pytest

    from bqetl_spark.operators.timeseries import event_pattern_extract

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 0, "view")],
        ["user_id", "ts", "event_id", "event_type"])
    with pytest.raises(ValueError, match="empty string"):
        event_pattern_extract(df, {"bad": "v*"}, {"view": "v"})
    with pytest.raises(ValueError, match="capturing"):
        event_pattern_extract(df, {"bad": "(vc)+p"}, {"view": "v"})
    with pytest.raises(ValueError, match="at least one"):
        event_pattern_extract(df, {}, {"view": "v"})

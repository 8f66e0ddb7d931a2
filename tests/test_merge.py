import pytest

from bqetl_spark.operators.merge import merge_into, scd2_intervals, upsert


def _has_delta():
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


def test_merge_into_parquet_fallback(spark, tmp_path):
    """Same upsert semantics through the stored-table path."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]) \
         .write.parquet(path)
    changes = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    got = {r["k"]: r["v"] for r in merge_into(spark, path, changes, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "C"}
    # and the files on disk really were rewritten
    back = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert back == got


def test_merge_into_delta_required_but_absent(spark, tmp_path):
    if _has_delta():
        pytest.skip("delta present; the gated branch is exercised for real")
    with pytest.raises(ImportError, match="delta-spark"):
        merge_into(spark, str(tmp_path), None, "k", fmt="delta")


@pytest.mark.skipif(not _has_delta(), reason="delta-spark not installed")
def test_merge_into_delta_native(spark, tmp_path):
    path = str(tmp_path / "dtbl")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]) \
         .write.format("delta").save(path)
    changes = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    got = {r["k"]: r["v"] for r in merge_into(spark, path, changes, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_upsert_replaces_and_inserts(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    changes = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    got = {r["k"]: r["v"] for r in upsert(base, changes, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_upsert_schema_mismatch_raises(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([(1, "a", 2)], ["k", "v", "extra"])
    with pytest.raises(ValueError, match="identical schemas"):
        upsert(base, changes, "k")


def test_scd2_intervals_chain(spark):
    log = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (1, 30, "z"), (2, 5, "q")],
        ["k", "t", "attr"])
    rows = scd2_intervals(log, "k", "t", ["attr"]).collect()
    got = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in rows}
    assert got[(1, "x")] == (10, 20)
    assert got[(1, "y")] == (20, 30)
    assert got[(1, "z")] == (30, None)   # open-ended current row
    assert got[(2, "q")] == (5, None)


def test_reconcile_classifies_all_four_statuses(spark):
    from bqetl_spark.operators.merge import reconcile

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        ["k", "price", "st"])
    new = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged
         (2, 25.0, "B"),          # changed (value)
         (3, 30.0, "C"),          # changed (NULL -> value must count)
         (5, 50.0, "E")],         # added; 4 removed
        ["k", "price", "st"])
    out = {r["k"]: r["status"] for r in reconcile(old, new, "k").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "removed", 5: "added"}


def test_reconcile_compare_cols_subset(spark):
    from bqetl_spark.operators.merge import reconcile

    old = spark.createDataFrame([(1, 10.0, "A")], ["k", "price", "st"])
    new = spark.createDataFrame([(1, 99.0, "A")], ["k", "price", "st"])
    # restricted to st only, the price difference is invisible
    out = reconcile(old, new, "k", compare_cols=["st"]).collect()
    assert out[0]["status"] == "unchanged"


def test_point_in_time_join_versions(spark):
    """Facts pick exactly the version containing their timestamp; facts
    before the first version keep NULLs (left); zero-width intervals from
    timestamp ties match nothing."""
    from pyspark.sql import functions as F

    from bqetl_spark.operators.merge import point_in_time_join, scd2_intervals

    changes = spark.createDataFrame(
        [(1, 100, "v1", 10), (1, 200, "v2", 11), (1, 300, "v3", 12),
         (2, 150, "w1", 20), (2, 150, "w2", 21)],   # tie: zero-width w1
        ["k", "t", "attr", "cid"])
    dim = scd2_intervals(changes, key="k", time_col="t",
                         attr_cols=["attr", "cid"], tiebreak_cols=["cid"])
    facts = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 250), (1, 999),
         (2, 149), (2, 150), (2, 151)],
        ["k", "t"])
    out = {(r["k"], r["t"]): r["attr"] for r in
           point_in_time_join(
               facts, dim.select("k", "attr", "valid_from", "valid_to"),
               "k", "t").collect()}
    assert out[(1, 50)] is None            # before first version
    assert out[(1, 100)] == "v1"           # boundary: valid_from inclusive
    assert out[(1, 250)] == "v2"
    assert out[(1, 999)] == "v3"           # open-ended current version
    assert out[(2, 149)] is None
    # tie at t=150: w1's interval is zero-width -> w2 wins from 150 on
    assert out[(2, 150)] == "w2" and out[(2, 151)] == "w2"
    assert len(out) == 7                   # at most one version per fact


def test_compact_changelog_latest_wins(spark):
    from bqetl_spark.operators.merge import compact_changelog

    changes = spark.createDataFrame(
        [(1, 100, 10, "a"), (1, 300, 11, "c"), (1, 200, 12, "b"),
         (2, 50, 20, "x"),
         (3, 70, 30, "t1"), (3, 70, 31, "t2")],   # tie -> higher id wins
        ["k", "t", "cid", "v"])
    got = {r["k"]: (r["t"], r["v"]) for r in
           compact_changelog(changes, key="k", ts_col="t",
                             tiebreak_cols=["cid"]).collect()}
    assert got == {1: (300, "c"), 2: (50, "x"), 3: (70, "t2")}

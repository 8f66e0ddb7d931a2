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

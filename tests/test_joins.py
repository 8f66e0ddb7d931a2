import pytest
from pyspark.sql import functions as F

from bqetl_spark.operators.joins import LookupDescription, inner_join, lookup
from bqetl_spark.sources.json_source import load_table_from_text
from tests.conftest import EXPECTED_JOIN_ROWS


def _credits(spark, b):
    return load_table_from_text(spark, f"{b}/artist_credit_name.json",
                                "artist_credit_name", key_name="artist_credit")


def _recordings(spark, b):
    return load_table_from_text(spark, f"{b}/recording.json",
                                "recording", key_name="artist_credit")


def test_inner_join_golden_cardinality(spark, mb_bucket):
    # analog of the 448-row golden join (MusicBrainzTransformsTest.java:115)
    joined = inner_join(_credits(spark, mb_bucket), _recordings(spark, mb_bucket),
                        "artist_credit_name_artist_credit", "recording_artist_credit")
    assert joined.count() == EXPECTED_JOIN_ROWS
    # contains known recording ids (analog of :97-110)
    ids = {r[0] for r in joined.select("recording_id").collect()}
    assert {50000, 52003} <= ids and 59999 not in ids


def test_inner_join_carries_both_sides(spark, mb_bucket):
    joined = inner_join(_credits(spark, mb_bucket), _recordings(spark, mb_bucket),
                        "artist_credit_name_artist_credit", "recording_artist_credit")
    assert "artist_credit_name_name" in joined.columns
    assert "recording_name" in joined.columns


def test_column_collision_raises(spark, mb_bucket):
    c = _credits(spark, mb_bucket)
    with pytest.raises(ValueError, match="collision"):
        inner_join(c, c, "artist_credit_name_artist_credit",
                   "artist_credit_name_artist_credit")


def test_lookup_decode_and_fallback(spark, mb_bucket):
    artists = load_table_from_text(spark, f"{mb_bucket}/artist.json", "artist",
                                   key_name="id")
    areas = load_table_from_text(spark, f"{mb_bucket}/area.json", "area")
    out = lookup(artists, areas, "artist",
                 LookupDescription("area", "id", "name", ["area", "begin_area"]))
    rows = {r["artist_id"]: r for r in out.collect()}
    # decode hit: 38 → "Canada" (golden, MusicBrainzTransformsTest.java:148-155)
    assert rows[1001]["artist_area"] == "Canada"
    # miss: 29450 not in dim → stringified id (MusicBrainzTransforms.java:488-494)
    assert rows[1001]["artist_begin_area"] == "29450"
    # NULL fk stays NULL
    assert rows[1002]["artist_area"] is None


def test_lookup_is_broadcast(spark, mb_bucket):
    artists = load_table_from_text(spark, f"{mb_bucket}/artist.json", "artist")
    areas = load_table_from_text(spark, f"{mb_bucket}/area.json", "area")
    out = lookup(artists, areas, "artist",
                 LookupDescription("area", "id", "name", ["area"]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_interval_overlap_join_equals_naive(spark):
    from bqetl_spark.operators.rangejoin import interval_overlap_join
    import itertools

    rows_l = [(i, lo, lo + ln) for i, (lo, ln) in
              enumerate([(0, 5), (3, 1), (10, 20), (100, 1), (7, 0)])]
    rows_r = [(j, lo, lo + ln) for j, (lo, ln) in
              enumerate([(4, 2), (0, 0), (29, 5), (31, 1), (99, 3)])]
    l = spark.createDataFrame(rows_l, ["a_id", "a_lo", "a_hi"])
    r = spark.createDataFrame(rows_r, ["b_id", "b_lo", "b_hi"])
    got = {(x["a_id"], x["b_id"]) for x in interval_overlap_join(
        l, r, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=7).collect()}
    want = {(a, b) for (a, alo, ahi), (b, blo, bhi)
            in itertools.product(rows_l, rows_r)
            if alo <= bhi and blo <= ahi}
    assert got == want  # exact, including touching endpoints, no dupes

from pyspark.sql import functions as F

from bqetl_spark.operators.joins import inner_join
from bqetl_spark.operators.nest import nest, split_repeated
from bqetl_spark.sources.json_source import load_table_from_text
from tests.conftest import EXPECTED_CHILDREN


def _nested(spark, b):
    artists = load_table_from_text(spark, f"{b}/artist.json", "artist", key_name="id")
    credits = load_table_from_text(spark, f"{b}/artist_credit_name.json",
                                   "artist_credit_name", key_name="artist_credit")
    recordings = load_table_from_text(spark, f"{b}/recording.json",
                                      "recording", key_name="artist_credit")
    joined = inner_join(credits, recordings,
                        "artist_credit_name_artist_credit", "recording_artist_credit")
    return nest(artists, joined, "artist_id", "artist_credit_name_artist",
                "artist_recordings",
                child_cols=["recording_name", "recording_length", "recording_id"],
                sort_children_by="recording_id")


def test_nest_child_counts(spark, mb_bucket):
    # analog of 1-artist-448-children golden (MusicBrainzTransformsTest.java:191-195)
    out = _nested(spark, mb_bucket)
    counts = {r["artist_id"]: len(r["artist_recordings"]) for r in out.collect()}
    assert counts == EXPECTED_CHILDREN


def test_nest_parent_unique_and_empty_array(spark, mb_bucket):
    out = _nested(spark, mb_bucket)
    assert out.count() == 3  # one row per artist, childless artist kept
    row = out.filter(F.col("artist_id") == 1003).first()
    assert row["artist_recordings"] == []  # empty list, not NULL (J3 left-outer flavor)


def test_nest_children_sorted(spark, mb_bucket):
    out = _nested(spark, mb_bucket)
    row = out.filter(F.col("artist_id") == 1002).first()
    ids = [c["recording_id"] for c in row["artist_recordings"]]
    assert ids == sorted(ids)


def test_split_repeated_chunks(spark, mb_bucket):
    out = _nested(spark, mb_bucket)
    split = split_repeated(out, "artist_recordings", limit=4)
    rows = split.filter(F.col("artist_id") == 1001).collect()
    sizes = sorted(len(r["artist_recordings"]) for r in rows)
    # 11 children, limit 4 → chunks of exactly ≤4: [3, 4, 4]
    # (documented intent, not the reference's 1001-then-1000 off-by-one)
    assert sizes == [3, 4, 4]


def test_split_repeated_under_limit_passthrough(spark, mb_bucket):
    out = _nested(spark, mb_bucket)
    split = split_repeated(out, "artist_recordings", limit=100)
    assert split.filter(F.col("artist_id") == 1001).count() == 1


def test_split_repeated_empty_array_kept(spark, mb_bucket):
    out = _nested(spark, mb_bucket)
    split = split_repeated(out, "artist_recordings", limit=4)
    # childless parent still emits one row with an empty chunk
    assert split.filter(F.col("artist_id") == 1003).count() == 1

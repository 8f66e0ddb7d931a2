from pyspark.sql import functions as F

from bqetl_spark.sources.json_source import load_table_from_text, load_text, namespace_columns


def test_load_text_lines(spark, mb_bucket):
    lines = load_text(spark, mb_bucket, "artist")
    assert lines.count() == 3
    assert lines.columns == ["value"]


def test_namespacing(spark, mb_bucket):
    df = load_table_from_text(spark, f"{mb_bucket}/artist.json", "artist")
    assert all(c.startswith("artist_") for c in df.columns)
    assert "artist_id" in df.columns and "artist_name" in df.columns


def test_null_fields_become_sql_null(spark, mb_bucket):
    # Reference drops JSON-null fields at parse (JSONReader.java:86-94);
    # SQL equivalent: the column is NULL for that row.
    df = load_table_from_text(spark, f"{mb_bucket}/artist.json", "artist")
    row = df.filter(F.col("artist_id") == 1001).first()
    assert row["artist_end_date_year"] is None
    assert row["artist_area"] == 38


def test_keyed_load_long_key(spark, mb_bucket):
    df = load_table_from_text(spark, f"{mb_bucket}/artist_credit_name.json",
                              "artist_credit_name", key_name="artist")
    assert dict(df.dtypes)["artist_credit_name_artist"] == "bigint"
    keys = {r[0] for r in df.select("artist_credit_name_artist").distinct().collect()}
    assert keys == {1001, 1002}


def test_in_memory_lines_source(spark):
    # S6 parity: Create.of(literal lines) (MusicBrainzTransformsTest.java:61-62)
    lines = spark.createDataFrame([('{"id": 7, "name": "x"}',)], ["value"])
    df = load_table_from_text(spark, lines, "t")
    row = df.first()
    assert row["t_id"] == 7 and row["t_name"] == "x"


def test_int_widened_to_long(spark, mb_bucket):
    df = load_table_from_text(spark, f"{mb_bucket}/recording.json", "recording")
    # all JSON ints → long (JSONReader.java:46-51)
    assert dict(df.dtypes)["recording_id"] == "bigint"
    assert dict(df.dtypes)["recording_length"] == "bigint"

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bqetl_spark.plans.etl_nested import bqetl_nested, nested_output_schema
from bqetl_spark.plans.etl_simple import bqetl_simple, simple_output_schema
from tests.conftest import EXPECTED_JOIN_ROWS


def _names_types(schema):
    # Spark does not carry REQUIRED through select/cast; compare name+type.
    return [(f.name, f.dataType) for f in schema.fields]


def test_simple_end_to_end(spark, mb_bucket):
    out = bqetl_simple(spark, mb_bucket)
    assert out.count() == EXPECTED_JOIN_ROWS
    assert _names_types(out.schema) == _names_types(simple_output_schema(False))
    # without lookups the FK columns stay integers
    assert isinstance(out.schema["artist_area"].dataType, T.LongType)


def test_simple_with_lookups(spark, mb_bucket):
    out = bqetl_simple(spark, mb_bucket, perform_lookups=True)
    assert out.count() == EXPECTED_JOIN_ROWS
    assert isinstance(out.schema["artist_area"].dataType, T.StringType)
    vals = {r["artist_area"] for r in out.select("artist_area").distinct().collect()}
    assert "Canada" in vals
    genders = {r["artist_gender"] for r in out.select("artist_gender").distinct().collect()}
    assert genders <= {"Male", "Female", None}


def test_simple_timestamp_parsed(spark, mb_bucket):
    out = bqetl_simple(spark, mb_bucket)
    assert isinstance(out.schema["artist_last_updated"].dataType, T.TimestampType)
    row = out.filter(F.col("artist_id") == 1001).first()
    assert row["artist_last_updated"] is not None
    assert row["artist_last_updated"].year == 2016


def test_nested_end_to_end(spark, mb_bucket):
    out = bqetl_nested(spark, mb_bucket)
    rows = {r["artist_id"]: r for r in out.collect()}
    assert set(rows) == {1001, 1002, 1003}
    assert len(rows[1001]["artist_recordings"]) == 11
    assert len(rows[1003]["artist_recordings"]) == 0
    assert rows[1001]["artist_area"] == "Canada"
    assert _names_types(out.schema) == _names_types(nested_output_schema())


def test_nested_respects_nesting_limit(spark, mb_bucket):
    out = bqetl_nested(spark, mb_bucket, nesting_limit=5)
    rows = out.filter(F.col("artist_id") == 1001).collect()
    sizes = sorted(len(r["artist_recordings"]) for r in rows)
    assert sizes == [1, 5, 5]  # 11 children split at 5

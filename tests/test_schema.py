from pyspark.sql import types as T

from bqetl_spark.schema import SchemaBuilder


def test_flat_builder_types():
    s = (SchemaBuilder()
         .integer("id", required=True)
         .string("name")
         .double("score")
         .boolean("ended")
         .timestamp("last_updated")
         .build())
    assert s["id"].dataType == T.LongType() and not s["id"].nullable
    assert s["name"].dataType == T.StringType() and s["name"].nullable
    assert s["score"].dataType == T.DoubleType()
    assert s["ended"].dataType == T.BooleanType()
    assert s["last_updated"].dataType == T.TimestampType()


def test_repeated_record():
    child = SchemaBuilder().string("recording_name").integer("recording_length")
    s = SchemaBuilder().integer("artist_id").repeated_record("artist_recordings", child).build()
    f = s["artist_recordings"]
    assert isinstance(f.dataType, T.ArrayType)
    assert isinstance(f.dataType.elementType, T.StructType)
    assert f.dataType.elementType.fieldNames() == ["recording_name", "recording_length"]


def test_field_names_order():
    b = SchemaBuilder().integer("a").string("b").boolean("c")
    assert b.field_names == ["a", "b", "c"]

from pyspark.sql import types as T

from bqetl_spark.schema import SchemaBuilder
from bqetl_spark.sources.sinks import write_parquet


def test_write_parquet_with_declared_schema_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "2016-03-27T21:04:19.254165+00:00"),
         (2, "b", None)],
        ["id", "name", "last_updated"])
    schema = (SchemaBuilder()
              .integer("id", required=True)
              .string("name")
              .timestamp("last_updated")
              .string("declared_only")   # absent in df → NULL column
              .build())
    out = str(tmp_path / "sink")
    write_parquet(df, out, schema=schema)
    back = spark.read.parquet(out)
    # declared-schema projection reached the sink (S5/R2 semantics)
    assert [f.name for f in back.schema.fields] == \
        ["id", "name", "last_updated", "declared_only"]
    assert isinstance(back.schema["last_updated"].dataType, T.TimestampType)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["last_updated"].year == 2016
    assert rows[1]["declared_only"] is None
    assert rows[2]["last_updated"] is None


def test_write_parquet_overwrite_mode(spark, tmp_path):
    out = str(tmp_path / "sink2")
    write_parquet(spark.range(10), out)
    write_parquet(spark.range(3), out)   # WRITE_TRUNCATE semantics
    assert spark.read.parquet(out).count() == 3

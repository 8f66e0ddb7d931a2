import pytest
from pyspark.sql import types as T

from bqetl_spark.schema import SchemaBuilder
from bqetl_spark.sources.sinks import (bigquery_to_schema,
                                       bigquery_write_plan,
                                       schema_to_bigquery, write_parquet)


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


# --- BigQuery write-plan contract (connector jar absent in this env: the
# plan is the full declarative surface write_bigquery consumes verbatim,
# so these tests pin everything short of the .save() network call) -------

_NESTED = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("price", T.DoubleType(), True),
    T.StructField("ok", T.BooleanType(), True),
    T.StructField("day", T.DateType(), True),
    T.StructField("children", T.ArrayType(T.StructType([
        T.StructField("ckey", T.LongType(), True),
        T.StructField("cname", T.StringType(), True),
    ])), True),
])


def test_bq_plan_partitioning_and_clustering_options():
    plan = bigquery_write_plan(
        "proj.ds.table", mode="append", temp_bucket="stage-bkt",
        partition_field="ts", partition_type="DAY",
        partition_expiration_ms=86_400_000,
        clustered_fields=["id", "name"], schema=_NESTED)
    assert plan["mode"] == "append" and plan["save"] == "proj.ds.table"
    o = plan["options"]
    assert o["writeMethod"] == "indirect"          # temp bucket → staged
    assert o["temporaryGcsBucket"] == "stage-bkt"
    assert o["partitionField"] == "ts" and o["partitionType"] == "DAY"
    assert o["partitionExpirationMs"] == "86400000"
    assert o["clusteredFields"] == "id,name"


def test_bq_plan_validations():
    with pytest.raises(ValueError, match="partition_type"):
        bigquery_write_plan("t", partition_field="ts", partition_type="WEEK")
    with pytest.raises(ValueError, match="1-4 clustering"):
        bigquery_write_plan("t", clustered_fields=["a", "b", "c", "d", "e"])
    with pytest.raises(ValueError, match="not in schema"):
        bigquery_write_plan("t", clustered_fields=["nope"], schema=_NESTED)
    with pytest.raises(ValueError, match="TIMESTAMP/DATE"):
        bigquery_write_plan("t", partition_field="name", schema=_NESTED)
    with pytest.raises(ValueError, match="requires partitioning"):
        bigquery_write_plan("t", partition_expiration_ms=1000)
    with pytest.raises(ValueError, match="unsupported sink mode"):
        bigquery_write_plan("t", mode="merge")


def test_bq_schema_mapping_reference_names():
    """Field list uses the reference's exact type/mode vocabulary
    (FieldSchemaListBuilder.java:27-34): INTEGER/STRING/TIMESTAMP/BOOLEAN/
    RECORD and REQUIRED/NULLABLE/REPEATED."""
    fields = {f["name"]: f for f in schema_to_bigquery(_NESTED)}
    assert fields["id"] == {"name": "id", "type": "INTEGER",
                            "mode": "REQUIRED"}
    assert fields["name"]["type"] == "STRING"
    assert fields["ts"]["type"] == "TIMESTAMP"
    assert fields["price"]["type"] == "FLOAT"
    assert fields["ok"]["type"] == "BOOLEAN"
    assert fields["day"]["type"] == "DATE"
    kids = fields["children"]
    assert kids["type"] == "RECORD" and kids["mode"] == "REPEATED"
    assert [c["name"] for c in kids["fields"]] == ["ckey", "cname"]


def test_bq_schema_roundtrip():
    """StructType → BigQuery fields → StructType is the identity for
    BigQuery-representable types (INT64/FLOAT64 widening already applied
    in the source schema)."""
    assert bigquery_to_schema(schema_to_bigquery(_NESTED)) == _NESTED


def test_bq_plan_embeds_schema():
    plan = bigquery_write_plan("t", schema=_NESTED)
    assert [f["name"] for f in plan["bigquery_schema"]] == \
        [f.name for f in _NESTED.fields]
    # default write path without a temp bucket is the direct API
    assert plan["options"]["writeMethod"] == "direct"

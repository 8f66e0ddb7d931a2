"""Edge-case coverage for operator contracts."""

import pytest
from pyspark.sql import functions as F

from bqetl_spark.operators.project import project_to_schema
from bqetl_spark.operators.skew import salted_join
from bqetl_spark.schema import SchemaBuilder
from bqetl_spark.sources.json_source import keyed


def test_project_strict_raises_on_missing_field(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    schema = SchemaBuilder().integer("a").string("missing").build()
    with pytest.raises(ValueError, match="missing"):
        project_to_schema(df, schema, strict=True)


def test_keyed_bad_cast_yields_null(spark):
    # P3 parity: cast failure → NULL row key, not a pipeline error
    # (MusicBrainzTransforms.java:75-78)
    df = spark.createDataFrame([("t_1", "42"), ("t_2", "not-a-number")],
                               ["t_id", "t_key"])
    out = keyed(df, "t", "key")
    got = {r["t_id"]: r["t_key"] for r in out.collect()}
    assert got["t_1"] == 42 and got["t_2"] is None


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (9, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "A")], ["rk", "rv"])
    rows = {r["k"]: r["rv"] for r in
            salted_join(left, right, "k", "rk", salt=4, how="left").collect()}
    assert rows == {1: "A", 9: None}


def test_lookup_multiple_destinations_one_dim(spark):
    # one LookupDescription rewriting two FK columns (BQETLSimple.java:70)
    from bqetl_spark.operators.joins import LookupDescription, lookup

    fact = spark.createDataFrame([(1, 10, 20)], ["f_id", "f_x", "f_y"])
    dim = spark.createDataFrame([(10, "ten"), (20, "twenty")],
                                ["d_id", "d_name"])
    out = lookup(fact, dim, "f",
                 LookupDescription("d", "id", "name", ["x", "y"])).first()
    assert out["f_x"] == "ten" and out["f_y"] == "twenty"

import pytest
from pyspark.sql import functions as F

from bqetl_spark.sources.bucketed import plan_has_shuffle, write_bucketed
from bqetl_spark.sources.parquet_source import load_parquet_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    orders = load_parquet_table(spark, SF_DIR, "orders")
    li = load_parquet_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "bkt.orders_b", "o_orderkey", 8)
    write_bucketed(li.withColumn("lk", F.col("l_orderkey")), "bkt.lineitem_b",
                   "lk", 8)
    yield
    spark.sql("DROP DATABASE bkt CASCADE")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    o = spark.table("bkt.orders_b")
    l = spark.table("bkt.lineitem_b")
    # disable broadcast so the Exchange-free plan is attributable to
    # bucketing (SortMergeJoin over pre-bucketed scans), not to a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o["o_orderkey"] == l["lk"]) \
                  .select("o_orderkey", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert not plan_has_shuffle(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_has_shuffle(spark):
    o = load_parquet_table(spark, SF_DIR, "orders")
    l = load_parquet_table(spark, SF_DIR, "lineitem")
    joined = o.join(l, o["o_orderkey"] == l["l_orderkey"]) \
              .select(o["o_orderkey"], "l_quantity")
    # force non-broadcast so the contrast is about bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o["o_orderkey"] == l["l_orderkey"]) \
                  .select(o["o_orderkey"], "l_quantity")
        assert plan_has_shuffle(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    o = spark.table("bkt.orders_b")
    agg = o.groupBy("o_orderkey").agg(F.count("*").alias("n"))
    assert not plan_has_shuffle(agg)

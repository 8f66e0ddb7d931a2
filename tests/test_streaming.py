import os

from pyspark.sql import functions as F

from bqetl_spark.streaming.events import (
    stream_click_to_purchase,
    stream_dedup_events,
    stream_event_counts,
)
from tests.conftest import SF_DIR


def test_stream_event_counts_available_now(spark, tmp_path):
    agg = stream_event_counts(spark, f"{SF_DIR}/events.parquet")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("ev_counts")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ev_counts")
    rows = out.collect()
    assert len(rows) > 0
    # streaming totals must equal the batch answer over the same data
    batch = (spark.read.parquet(f"{SF_DIR}/events.parquet").count())
    assert sum(r["n_events"] for r in rows) == batch


def test_stream_stream_join_matches_batch(spark, tmp_path):
    joined = stream_click_to_purchase(spark, f"{SF_DIR}/events.parquet")
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("c2p")
         .option("checkpointLocation", str(tmp_path / "ckpt3"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) n FROM c2p").first()["n"]
    # batch equivalent over the same bounded data (load_events converts the
    # nanos ts; a raw read under nanosAsLong leaves it BIGINT)
    from bqetl_spark.sources.parquet_source import load_events

    ev = load_events(spark, SF_DIR)
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    batch = c.join(p, (F.col("cu") == F.col("pu")) &
                   (F.col("pts") >= F.col("cts")) &
                   (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR"))).count()
    assert got == batch and batch > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    dedup = stream_dedup_events(spark, f"{SF_DIR}/events.parquet")
    q = (dedup.writeStream.outputMode("append")
         .format("memory").queryName("ev_dedup")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d FROM ev_dedup").first()
    batch_distinct = (spark.read.parquet(f"{SF_DIR}/events.parquet")
                      .select("event_id").distinct().count())
    assert got["n"] == got["d"] == batch_distinct

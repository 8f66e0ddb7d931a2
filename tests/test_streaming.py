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


def test_stream_upsert_merges_across_batches(spark, tmp_path):
    """foreachBatch upsert with a REAL multi-batch replay: events split
    into 3 files, maxFilesPerTrigger=1 → 3 micro-batches, each merging
    its users' new running totals into the stored table. Final table must
    equal the batch group-by — the cross-batch merge path, not just a
    single-batch write."""
    from bqetl_spark.sources.parquet_source import load_events
    from bqetl_spark.streaming.events import stream_upsert_user_totals

    ev = load_events(spark, SF_DIR)
    src = str(tmp_path / "ev3")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    assert len([f for f in __import__("os").listdir(src)
                if f.endswith(".parquet")]) == 3

    target = str(tmp_path / "totals")
    stream_upsert_user_totals(spark, src, target, max_files_per_trigger=1)
    got = {r["user_id"]: r["n_events"]
           for r in spark.read.parquet(target).collect()}
    want = {r["user_id"]: r["n"]
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == want

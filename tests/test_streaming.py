import os

from bqetl_spark.streaming.events import stream_dedup_events, stream_event_counts
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

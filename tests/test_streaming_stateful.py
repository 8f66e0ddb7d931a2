from pyspark.sql import functions as F

from bqetl_spark.streaming.stateful import stream_user_totals
from tests.conftest import SF_DIR


def test_stateful_totals_match_batch(spark, tmp_path):
    agg = stream_user_totals(spark, f"{SF_DIR}/events.parquet")
    q = (agg.writeStream.outputMode("update")
         .format("memory").queryName("user_totals")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    # last snapshot per user (bounded replay may emit several micro-batches)
    out = spark.sql("""
        SELECT user_id, max_by(n_events, n_events) n_events
        FROM user_totals GROUP BY user_id""")
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    batch = {r["user_id"]: r["n"] for r in
             (spark.read.parquet(f"{SF_DIR}/events.parquet")
              .groupBy("user_id").agg(F.count("*").alias("n")).collect())}
    assert got == batch


def test_stream_session_counts_equals_batch_rule(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from bqetl_spark.streaming.stateful import stream_session_counts
    from bqetl_spark.sources.parquet_source import load_events
    snap = stream_session_counts(spark, f"{SF_DIR}/events.parquet")
    q = (snap.writeStream.format("memory").queryName("sess_snap")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: r["n"] for r in
           spark.sql("SELECT user_id, max(n_sessions) AS n FROM sess_snap "
                     "GROUP BY user_id").collect()}
    ev = load_events(spark, SF_DIR)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (ev.withColumn("prev", F.lag(F.unix_micros("ts")).over(w))
             .withColumn("brk", F.when(
                 F.col("prev").isNull() |
                 ((F.unix_micros("ts") - F.col("prev")) > 1_800_000_000), 1)
                 .otherwise(0))
             .groupBy("user_id").agg(F.sum("brk").alias("n")))
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert got == want

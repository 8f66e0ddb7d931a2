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

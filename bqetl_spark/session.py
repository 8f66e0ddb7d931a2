"""SparkSession factory.

The reference configures its runner by hand (worker counts, disk:
BQETLSimple.java:41-45, run.sh:59-60). Spark's equivalent knobs live here,
with AQE enabled so the engine re-plans from runtime statistics instead of
hard-coding physical strategy the way the Beam DAG does
(MusicBrainzTransforms.java:82-99 vs :402-423 — shuffle vs broadcast chosen
by the author; Catalyst+AQE chooses from data sizes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test boxes run a single JVM; a real deployment overrides these via
# spark-submit --conf. Shuffle partitions sized to cores locally; on a
# 1000-executor cluster AQE coalescing makes the initial number forgiving.
_DEFAULTS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Spark 4 reads tz-less parquet timestamps as TIMESTAMP_NTZ by default;
    # the engine's time semantics (watermarks, unix_micros, windows) are
    # LTZ-with-UTC-session, matching DuckDB's naive timestamps bit-for-bit.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "48g",
}


def get_spark(app_name: str = "bqetl_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    master is configured in the environment.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

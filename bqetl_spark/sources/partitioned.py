"""Hive-style partitioned parquet writer + pruning audit.

The 100 TB ingest layout: facts land partitioned by a low-cardinality
derived column (event date, source shard). A time-ranged query then prunes
at the DIRECTORY level — partitions outside the predicate are never listed,
opened, or scanned, which is the difference between reading 100 TB and
reading one day of it. Pruning happens at planning time and shows up as
``PartitionFilters`` on the scan node (vs ``PushedFilters``, which still
opens every file and relies on row-group stats).

Keep partition cardinality sane: one directory per value, so date/hour or a
16-way shard id is right and user_id is catastrophically wrong (millions of
tiny files). High-cardinality layout wants bucketing (``bucketed.py``)
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Write parquet partitioned by ``partition_cols`` (directory-encoded).

    Spark writes one directory per distinct partition-column tuple; a
    ``maxRecordsPerFile``-style split is unnecessary here because the
    within-partition parallelism is preserved (each task writes its own
    file under every partition dir it holds rows for).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns come from the
    directory names and participate in planning-time pruning."""
    return spark.read.parquet(path)


def partition_filters(df: DataFrame) -> str:
    """The scan's PartitionFilters line (test/audit helper) — a filtered
    read of a partitioned layout must show its predicate here, not just in
    PushedFilters."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""


def prunes_partitions(df: DataFrame) -> bool:
    """True if the plan carries a non-empty partition-level filter."""
    line = partition_filters(df)
    return bool(line) and "PartitionFilters: []" not in line

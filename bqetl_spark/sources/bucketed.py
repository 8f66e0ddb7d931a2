"""Bucketed table writer — co-located joins without a shuffle.

At 100 TB the dominant cost of the flagship denormalization is shuffling the
fact tables on their join keys for every run. Writing both sides bucketed by
the key (`bucketBy(n, key).sortBy(key)`) pins a hash-partition layout into
the table itself, so every later equi-join or aggregation on that key runs
Exchange-free — the classic amortize-one-shuffle-forever trade.

Bucketed output requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (test/audit
    helper — bucketed joins should return False)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan

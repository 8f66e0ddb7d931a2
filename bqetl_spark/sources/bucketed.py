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
    # r12 (guide §2.5/§6): a single-file scan feeds saveAsTable as ONE
    # task, serializing the whole per-bucket sort+write; hash-
    # repartitioning on the bucket key first runs it `buckets`-way
    # parallel, and because repartition and the bucket spec share the
    # Murmur3 hash each task holds whole buckets (file count stays
    # `buckets`). Table contents and bucket metadata are unchanged —
    # measured 3.0 s → sub-second on the sf0.1 lineitem write.
    from pyspark.sql import functions as F

    writer = (df.repartition(buckets, F.col(key))
              .write.mode(mode).bucketBy(buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (test/audit
    helper — bucketed joins should return False)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan

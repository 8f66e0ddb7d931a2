"""Small-file compaction — the table-maintenance half of the layout story.

A long-running ingest (micro-batches, per-partition writers) leaves
thousands of KB-sized parquet files; each costs a task + a footer read +
an object-store request at 100 TB. Compaction rewrites a directory into
size-targeted files. Complements ``operators/layout.py`` (Z-order decides
ROW order; compaction decides FILE granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None) -> DataFrame:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_bytes`` per output file.

    File count = ceil(on-disk bytes / target) — compressed size is the
    right proxy because the rewrite re-encodes with the same codec.
    With ``sort_cols`` the rewrite uses ``repartitionByRange`` +
    per-file sort, so compaction doubles as a clustering pass (min/max
    footer stats become tight on the sort key — same skipping mechanism
    the Z-order tests measure); otherwise a plain ``coalesce`` avoids a
    shuffle entirely (pure file-granularity fix). Returns the reread
    compacted DataFrame.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if os.path.realpath(src) == os.path.realpath(dst):
        # the overwrite write reads src LAZILY — compacting in place would
        # truncate the directory mid-scan and destroy the data
        raise ValueError(f"compact_parquet src == dst ({src}); "
                         "write to a new directory and swap")
    total = parquet_bytes(src)
    n_files = max(1, -(-total // target_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        out = (df.repartitionByRange(n_files, *sort_cols)
               .sortWithinPartitions(*sort_cols))
    elif df.rdd.getNumPartitions() < n_files:
        # coalesce can only DECREASE partition count; a few huge input
        # files targeted at many small outputs needs a real repartition or
        # every output file would far exceed target_bytes
        out = df.repartition(n_files)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)

"""Shared persisted-state replacement for the foreachBatch sinks.

Every streaming-maintenance sink in this package folds a bounded sketch /
index table and replaces the persisted parquet dir with the merged result.
The merged plan lazily READS the current ``target_path`` files, so the new
rows must be materialized elsewhere before the dir can be replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def replace_parquet_state(out: DataFrame, target_path: str,
                          batch_id: int) -> None:
    """Materialize ``out`` beside ``target_path`` and swap it in.

    r12 optimization (guide §6/§1.2): the r6–r11 sinks wrote the merge to
    a tmp dir and then ran a SECOND Spark job copying tmp → target
    (read.parquet(tmp).write(target)) plus an rmtree — two full write
    jobs per micro-batch for a bounded-size state table. The copy job
    only existed to move bytes back under the canonical path, which a
    filesystem rename does as a metadata operation: write tmp (the one
    unavoidable job — it consumes the old target files), rmtree target,
    rename tmp → target. Final state is byte-identical; per-batch Spark
    jobs halve. The non-atomic rmtree+rename window is no worse than the
    prior copy's overwrite window (which truncated target before
    rewriting it); real restart tolerance comes from foreachBatch's
    checkpointed batch ids either way, as documented on each sink.
    """
    import os
    import shutil

    tmp = target_path + f".batch{batch_id}"
    out.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)

"""Sinks.

S5 parity: the reference writes to BigQuery with an explicit schema,
truncate + create-if-needed (BQETLSimple.java:113-120, BQETLNested.java:85-91).
Spark equivalent is the spark-bigquery-connector; its jar is not in this
environment, so the BigQuery path is gated and the local sink is parquet
(same declared-schema projection + overwrite semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from bqetl_spark.operators.project import project_to_schema


def write_parquet(df: DataFrame, path: str, schema: T.StructType | None = None,
                  mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Local/lake sink. ``schema`` replays the reference's schema-driven
    projection (only declared fields reach the sink,
    MusicBrainzTransforms.java:229-249)."""
    if schema is not None:
        df = project_to_schema(df, schema)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def bigquery_write_plan(table: str, mode: str = "overwrite",
                        temp_bucket: str | None = None) -> dict:
    """The exact sink contract the reference's writer carries
    (BQETLSimple.java:113-120: WRITE_TRUNCATE + CREATE_IF_NEEDED against an
    explicit schema). Declarative so it can be contract-tested without the
    connector jar; ``write_bigquery`` consumes it verbatim."""
    if mode not in ("overwrite", "append", "errorifexists", "ignore"):
        raise ValueError(f"unsupported sink mode: {mode!r}")
    plan = {
        "format": "bigquery",
        # WRITE_TRUNCATE ≙ overwrite; CREATE_IF_NEEDED is the connector's
        # default table-creation behavior
        "mode": mode,
        "save": table,
        "options": {
            # direct write path needs no GCS staging; the indirect path
            # requires the temp bucket option
            "writeMethod": "indirect" if temp_bucket else "direct",
        },
    }
    if temp_bucket:
        plan["options"]["temporaryGcsBucket"] = temp_bucket
    return plan


def write_bigquery(df: DataFrame, table: str, schema: T.StructType | None = None,
                   mode: str = "overwrite", temp_bucket: str | None = None) -> None:
    """BigQuery sink via spark-bigquery-connector (WRITE_TRUNCATE ≙ overwrite,
    BQETLSimple.java:117-119). Requires the connector jar on the classpath."""
    if schema is not None:
        df = project_to_schema(df, schema)
    plan = bigquery_write_plan(table, mode, temp_bucket)
    writer = df.write.format(plan["format"]).mode(plan["mode"])
    for key, val in plan["options"].items():
        writer = writer.option(key, val)
    try:
        writer.save(plan["save"])
    except Exception as exc:  # connector jar absent in this environment
        raise NotImplementedError(
            "BigQuery sink needs the spark-bigquery-connector jar on the "
            "classpath (spark.jars.packages=com.google.cloud.spark:"
            "spark-bigquery-with-dependencies_2.13:<ver>); use write_parquet "
            "locally"
        ) from exc

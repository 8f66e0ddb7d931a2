"""Declared-schema projection (P1/R2).

The reference ships its output schema to workers and keeps only columns whose
names appear in it, skipping null values (MusicBrainzTransforms.java:194-214,
schema-key loop :229-249). Spark-first this is a ``select`` + ``cast`` that
Catalyst pushes down to the scan — the reference carries every column through
every shuffle and drops them only at the sink, so our plan strictly beats it
on shuffle/IO volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def project_to_schema(df: DataFrame, schema: T.StructType,
                      strict: bool = False) -> DataFrame:
    """Keep exactly the declared fields, in declared order, cast to declared
    types. Fields absent from ``df`` become NULL columns (the reference's
    per-row skip of missing values is the same observable result).
    TIMESTAMP fields parse ISO-8601 strings (the reference forwards strings
    and lets BigQuery coerce — BQETLSimple.java:142; a typed engine parses).
    """
    have = set(df.columns)
    cols = []
    for f in schema.fields:
        if f.name in have:
            src = F.col(f.name)
            if isinstance(f.dataType, T.TimestampType) and \
                    isinstance(df.schema[f.name].dataType, T.StringType):
                src = F.try_to_timestamp(src)
            # try_cast: malformed value → NULL (reference parses leniently;
            # an ANSI cast error would fail the whole pipeline on one bad row)
            cols.append(src.try_cast(f.dataType).alias(f.name))
        elif strict:
            raise ValueError(f"schema field {f.name!r} missing from DataFrame")
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)

"""CSV table loading with the same namespacing/keying contract as the
NDJSON loader (beyond reference parity — the reference ingests NDJSON only,
but a drop-in engine meets pipelines that land CSV).

Same composition as ``json_source``: scan is JVM-side and vectorized,
schema is either declared (preferred — inference is a second pass over the
data) or inferred, columns namespaced ``{table}_{col}``, optional long key
with try_cast→NULL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bqetl_spark.sources.json_source import keyed, namespace_columns


def load_csv_table(spark: SparkSession, path: str, name: str,
                   schema: T.StructType | None = None,
                   header: bool = True,
                   key_name: str | None = None) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        df = reader.csv(path, schema=schema)
    else:
        # inference costs an extra pass over the files — declare schemas on
        # anything big
        df = reader.option("inferSchema", "true").csv(path)
    df = namespace_columns(df, name)
    if key_name is not None:
        df = keyed(df, name, key_name)
    return df

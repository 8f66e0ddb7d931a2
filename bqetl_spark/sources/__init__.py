from bqetl_spark.sources.json_source import (
    load_table,
    load_table_from_text,
    load_text,
    namespace_columns,
)
from bqetl_spark.sources.parquet_source import load_events, load_parquet_table, load_star
from bqetl_spark.sources.sinks import write_bigquery, write_parquet

__all__ = [
    "load_text",
    "load_table_from_text",
    "load_table",
    "namespace_columns",
    "load_parquet_table",
    "load_events",
    "load_star",
    "write_parquet",
    "write_bigquery",
]

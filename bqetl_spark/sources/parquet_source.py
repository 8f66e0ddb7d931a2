"""Parquet table loading for the driver's TPC-H-ish star schema.

Columnar scans give column pruning + predicate pushdown for free — the plan
should show ``PushedFilters``/``ReadSchema`` restricted to what the query
touches. At 100 TB the same code path reads a partitioned lake directory;
nothing here assumes local files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bqetl_spark.sources.json_source import namespace_columns

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_parquet_table(spark: SparkSession, sf_dir: str, name: str,
                       namespace: bool = False) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    return namespace_columns(df, name) if namespace else df


def load_star(spark: SparkSession, sf_dir: str,
              tables: tuple[str, ...] = STAR_TABLES) -> dict[str, DataFrame]:
    return {t: load_parquet_table(spark, sf_dir, t) for t in tables}

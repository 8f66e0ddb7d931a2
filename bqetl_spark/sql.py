"""SQL front door: register the star schema as temp views and run raw
ANSI SQL through Catalyst — the surface analysts use directly, sharing
every optimization (pushdown, broadcast, AQE) with the DataFrame API
since both lower to the same logical plans.

The reference has no SQL layer (hand-built Beam DAGs only); this is the
capability its users gain by switching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bqetl_spark.sources.parquet_source import STAR_TABLES, load_events, load_parquet_table


def register_star(spark: SparkSession, sf_dir: str,
                  tables: tuple[str, ...] = STAR_TABLES) -> list[str]:
    """Create one temp view per table (events through the nanos-aware
    loader). Returns the registered names. Views are lazy — registering
    costs nothing until a query reads them."""
    out = []
    for t in tables:
        df = (load_events(spark, sf_dir) if t == "events"
              else load_parquet_table(spark, sf_dir, t))
        df.createOrReplaceTempView(t)
        out.append(t)
    return out


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register the star schema, run ``query``."""
    register_star(spark, sf_dir)
    return spark.sql(query)

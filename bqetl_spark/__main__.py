"""CLI parity with the reference's run.sh + BQETLOptions
(run.sh:17-34, BQETLOptions.java:23-48).

    python -m bqetl_spark simple            --loading-bucket-url DIR --output OUT
    python -m bqetl_spark simple-with-lookups ...
    python -m bqetl_spark nested            ...

The reference selects a main class per pipeline name and passes
--loadingBucketURL / --bigQueryTablename / --overwriteBigQueryTable /
--performLookups; here the same surface drives the library plans
end-to-end: load NDJSON bucket -> join/nest/project -> sink. The sink is
parquet by default (this environment carries no BigQuery connector jar);
``--sink bigquery`` routes through ``write_bigquery`` with the same
declared-schema + truncate semantics.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

PIPELINES = ("simple", "simple-with-lookups", "nested", "corpus")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m bqetl_spark",
        description="Run a bqetl pipeline end-to-end (load -> transform -> sink)",
    )
    p.add_argument("pipeline", choices=PIPELINES,
                   help="pipeline to run (run.sh:17-34 names)")
    p.add_argument("--loading-bucket-url", required=True,
                   help="directory/bucket holding {table}.json NDJSON inputs "
                        "(BQETLOptions.getLoadingBucketURL)")
    p.add_argument("--output", required=True,
                   help="parquet path, or BigQuery table when --sink bigquery "
                        "(BQETLOptions.getBigQueryTablename)")
    p.add_argument("--sink", choices=("parquet", "bigquery"), default="parquet")
    p.add_argument("--append", action="store_true",
                   help="append instead of truncate "
                        "(inverse of BQETLOptions.getOverwriteBigQueryTable)")
    p.add_argument("--perform-lookups", action="store_true",
                   help="decode area/gender FKs via broadcast lookups; implied "
                        "by simple-with-lookups, always on for nested")
    p.add_argument("--nesting-limit", type=int, default=1000,
                   help="row-split repeated records at this many children "
                        "(nested only; BigQuery's documented limit is 1000)")
    p.add_argument("--temp-bucket", default=None,
                   help="GCS staging bucket for the indirect BigQuery write path")
    p.add_argument("--lang", default="en",
                   help="corpus pipeline: target language gate")
    p.add_argument("--sample-rate", type=float, default=None,
                   help="corpus pipeline: optional deterministic sample rate")
    p.add_argument("--chunk-size", type=int, default=64,
                   help="corpus pipeline: tokens per chunk")
    p.add_argument("--pack-budget", type=int, default=2048,
                   help="corpus pipeline: tokens per training pack")
    p.add_argument("--shards", type=int, default=None,
                   help="corpus pipeline: write shard=K/ trainer layout "
                        "with deterministic md5-mod membership")
    p.add_argument("--master", default="local[*]",
                   help="Spark master (ignored when run under spark-submit)")
    return p


def run(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    """Entry point; ``spark`` is injectable so tests reuse one session."""
    args = build_parser().parse_args(argv)
    # imports deferred so --help works without a JVM spin-up
    from bqetl_spark.plans.etl_nested import bqetl_nested, nested_output_schema
    from bqetl_spark.plans.etl_simple import bqetl_simple, simple_output_schema
    from bqetl_spark.sources.sinks import write_bigquery, write_parquet

    owns_session = spark is None
    if owns_session:
        spark = (SparkSession.builder.master(args.master)
                 .appName(f"bqetl-{args.pipeline}").getOrCreate())
        # size initial reducers from the input footprint when it's a local
        # path (AQE only coalesces down); harmless no-op for bucket URLs
        import os as _os

        from bqetl_spark.session import tune_shuffle_partitions
        src = args.loading_bucket_url
        if _os.path.isdir(src):
            tune_shuffle_partitions(spark, src)
    try:
        if args.pipeline == "corpus":
            from bqetl_spark.plans.corpus_pipeline import run_corpus_pipeline

            n = run_corpus_pipeline(
                spark, args.loading_bucket_url, args.output,
                lang=args.lang, sample_rate=args.sample_rate,
                chunk_size=args.chunk_size, pack_budget=args.pack_budget,
                n_shards=args.shards)
            print(f"corpus: wrote {n} chunks to {args.output}")
            return 0
        lookups = args.perform_lookups or args.pipeline == "simple-with-lookups"
        if args.pipeline == "nested":
            df = bqetl_nested(spark, args.loading_bucket_url,
                              nesting_limit=args.nesting_limit)
            schema = None  # bqetl_nested already projects + row-splits
        else:
            df = bqetl_simple(spark, args.loading_bucket_url,
                              perform_lookups=lookups)
            schema = simple_output_schema(lookups)

        mode = "append" if args.append else "overwrite"
        if args.sink == "bigquery":
            write_bigquery(df, args.output, schema=schema, mode=mode,
                           temp_bucket=args.temp_bucket)
        else:
            write_parquet(df, args.output, schema=schema, mode=mode)
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(run())

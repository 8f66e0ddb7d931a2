"""Custom Python DataSource: NDJSON shards via Spark 4's DataSource API.

The MODERN connector path for the reference's S1/S2 surface
(MusicBrainzTransforms.java:531-537 loadText + :374-380
loadTableFromText): `spark.read.format("bqetl_ndjson")` with a declared
schema, one InputPartition per shard file so a directory of shards reads
in parallel across executors — real partition planning, not a single-task
Python read.

Semantics match the reference's JSONReader (JSONReader.java:42-62,86-94):
JSON null and absent fields both surface as SQL NULL; integers widen to
long; nested objects/arrays are unsupported at input and read as NULL
(the reference logs-and-drops them). Type coercion is schema-driven: a
value that cannot coerce to the declared type becomes NULL, mirroring the
try_cast discipline of the S3 keyed loader.

At 100 TB the shard list IS the parallelism plan: one partition per
object-store file, the same granularity Spark's native text source uses;
oversized single shards should be split upstream (the API exposes no
sub-file byte ranges for Python sources yet — documented limit).

CLOSURE-LOCAL CLASSES: everything is defined inside the factory so
cloudpickle ships the classes BY VALUE — Spark's Python workers never
need this package importable on their sys.path (the same external-driver
constraint every UDF factory in this repo documents; the by-reference
version failed exactly that way under the vanilla driver probe).
"""

from __future__ import annotations


def _build():
    from pyspark.sql import types as T
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)

    class _Shard(InputPartition):
        def __init__(self, path: str):
            self.path = path

    def _coerce(value, dtype):
        """Schema-driven coercion, bad values → NULL (try_cast)."""
        if value is None or isinstance(value, (dict, list)):
            return None  # JSON null / nested: reference drops both
        try:
            if isinstance(dtype, (T.LongType, T.IntegerType)):
                return int(value) if not isinstance(value, bool) else None
            if isinstance(dtype, T.DoubleType):
                return float(value) if not isinstance(value, bool) else None
            if isinstance(dtype, T.StringType):
                return value if isinstance(value, str) else str(value)
            if isinstance(dtype, T.BooleanType):
                return value if isinstance(value, bool) else None
        except (TypeError, ValueError):
            return None
        return None  # undeclared type: surface as NULL, never crash

    class _NdjsonReader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")
            if not self._path:
                raise ValueError("bqetl_ndjson requires a path "
                                 "(load(path) or .option('path', ...))")

        def partitions(self):
            import glob
            import os

            p = self._path
            if os.path.isdir(p):
                files = sorted(glob.glob(os.path.join(p, "*.json"))
                               + glob.glob(os.path.join(p, "*.ndjson")))
            else:
                files = sorted(glob.glob(p)) or [p]
            if not files:
                raise FileNotFoundError(f"no NDJSON shards under {p!r}")
            return [_Shard(f) for f in files]

        def read(self, partition):
            import json

            fields = [(f.name, f.dataType) for f in self._schema.fields]
            with open(partition.path, "rb") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    obj = json.loads(line)
                    yield tuple(_coerce(obj.get(name), dt)
                                for name, dt in fields)

    class NdjsonDataSource(DataSource):
        """`spark.dataSource.register(NdjsonDataSource)` then
        `spark.read.format("bqetl_ndjson").schema(s).load(dir_or_glob)`."""

        @classmethod
        def name(cls):
            return "bqetl_ndjson"

        def schema(self):
            raise ValueError(
                "bqetl_ndjson requires an explicit .schema(...) — schema "
                "inference would need a pre-scan; declare the contract "
                "like the reference's sinks do")

        def reader(self, schema):
            return _NdjsonReader(schema, self.options)

    return NdjsonDataSource


NdjsonDataSource = _build()

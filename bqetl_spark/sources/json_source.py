"""NDJSON table loading with column namespacing.

Parity targets:
- S1 ``loadText``            (MusicBrainzTransforms.java:531-537)
- S2 ``loadTableFromText``   (MusicBrainzTransforms.java:374-380 +
                              JSONReader.java:71-101)
- S3 keyed ``loadTableFromText`` (MusicBrainzTransforms.java:350-363)
- S4 ``loadTable`` overloads (MusicBrainzTransforms.java:307-338)
- P2 column namespacing      (MusicBrainzDataObject.java:73-76)
- P3 ``by`` re-key           (MusicBrainzTransforms.java:66-80)

Spark-first notes: instead of parsing JSON per line in Python the way the
reference parses per line with Jackson, we hand the whole file to
``spark.read.json`` (JVM-side, vectorized, schema inference or explicit
StructType). "Keying" a collection is a no-op in Spark — the key is just a
named column later used in joins/groupBys — so S3/P3 reduce to remembering
the key column name and casting it to long (cast failure → NULL, matching
MusicBrainzTransforms.java:75-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def table_path(bucket: str, name: str) -> str:
    # Reference: path = bucket + "/" + name + ".json"
    # (MusicBrainzTransforms.java:545-547).
    return f"{bucket.rstrip('/')}/{name}.json"


def load_text(spark: SparkSession, bucket: str, name: str) -> DataFrame:
    """S1: one table's NDJSON file as raw lines (value: string)."""
    return spark.read.text(table_path(bucket, name))


def namespace_columns(df: DataFrame, name: str) -> DataFrame:
    """P2: prefix every column as ``{table}_{column}``.

    The reference namespaces at insertion time (MusicBrainzDataObject.java:73-76)
    to avoid collisions after joins; here it is a pure projection the optimizer
    folds into the scan.
    """
    return df.select([F.col(c).alias(f"{name}_{c}") for c in df.columns])


def keyed(df: DataFrame, name: str, key_name: str) -> DataFrame:
    """S3/P3: designate ``{name}_{key_name}`` as the join key, cast to long.

    Beam wraps rows as KV<Long, row>; in Spark the key is just a column.
    A failed cast yields NULL (MusicBrainzTransforms.java:75-78 emits null on
    NumberFormatException — same observable behavior under SQL semantics).
    """
    key_col = f"{name}_{key_name}" if not key_name.startswith(f"{name}_") else key_name
    # try_cast: malformed key → NULL, matching the reference's
    # NumberFormatException → null (not an ANSI runtime error).
    return df.withColumn(key_col, F.col(key_col).try_cast(T.LongType()))


def load_table_from_text(spark: SparkSession, lines: DataFrame | str, name: str,
                         key_name: str | None = None,
                         schema: T.StructType | None = None) -> DataFrame:
    """S2/S3: parse NDJSON into a namespaced DataFrame.

    ``lines`` may be a path (preferred — lets Spark scan the file directly) or
    a DataFrame of raw lines (test in-memory source, parity S6).
    JSON nulls become SQL NULLs (the reference drops null fields at parse,
    JSONReader.java:86-94 — equivalent observable behavior under SQL).
    Nested objects/arrays in input are unsupported by the reference
    (JSONReader.java:58-60); we keep them if a schema asks, else inference
    may surface them — callers projecting through a declared schema drop them.
    """
    if isinstance(lines, str):
        reader = spark.read
        if schema is not None:
            df = reader.json(lines, schema=schema)
        else:
            df = reader.option("primitivesAsString", "false").json(lines)
    else:
        str_col = lines.columns[0]
        if schema is not None:
            df = lines.select(F.from_json(F.col(str_col), schema).alias("r")).select("r.*")
        else:
            # Schema inference over an in-memory lines DF: PySpark's reader
            # takes only paths or RDDs (the Dataset[String] overload is
            # Scala-only), so spill the lines to a temp text dir and take the
            # file branch — JVM-side inference, executor-parallel, no Python
            # row round-trip.
            import tempfile

            tmp = tempfile.mkdtemp(prefix="bqetl_lines_")
            (lines.select(F.col(str_col).cast("string").alias("value"))
             .na.drop().write.mode("overwrite").text(tmp))
            df = spark.read.option("primitivesAsString", "false").json(tmp)
    df = namespace_columns(df, name)
    if key_name is not None:
        df = keyed(df, name, key_name)
    return df


def load_table(spark: SparkSession, bucket: str, name: str,
               key_name: str | None = None,
               lookups: list | None = None,
               schema: T.StructType | None = None) -> DataFrame:
    """S4: compose load_text + parse + namespace (+ broadcast lookups).

    Mirrors the loadTable overloads (MusicBrainzTransforms.java:307-338):
    the variant with LookupDescriptions decodes FK columns against small
    dimension tables via broadcast join (see operators.joins.lookup).
    """
    df = load_table_from_text(spark, table_path(bucket, name), name, key_name, schema)
    if lookups:
        from bqetl_spark.operators.joins import apply_lookups

        df = apply_lookups(spark, bucket, df, name, lookups)
    return df

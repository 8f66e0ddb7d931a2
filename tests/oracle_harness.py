"""Local replica of the driver's DuckDB-oracle comparison.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive canonical value hash. Used by tests/test_entry.py as the
pre-flight for the real correctness gate.
"""

from __future__ import annotations

import hashlib
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr keeps full double precision; -0.0 normalized
        return repr(v + 0.0) if v != 0 else "0.0"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, con, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    res = {
        "rows_spark": len(s_rows), "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols), "cols_duck": sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    res["hash_match"] = (res["rows_match"] and res["cols_match"] and
                         value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows))
    return res


def first_diff(spark_df, con, sql: str, limit: int = 5):
    """Debug helper: show a few rows present in one side only."""
    s_cols = spark_df.columns
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s = {"|".join(_canon(t[i]) for i in order) for t in
         (tuple(r) for r in spark_df.collect())}
    rel = con.sql(sql)
    d_cols = rel.columns
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d = {"|".join(_canon(t[i]) for i in order_d) for t in rel.fetchall()}
    return {"spark_only": sorted(s - d)[:limit], "duck_only": sorted(d - s)[:limit],
            "spark_cols": sorted(s_cols), "duck_cols": sorted(d_cols)}

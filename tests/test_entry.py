"""Pre-flight for the driver's correctness gate: every queries() entry with
an oracle must hash-match DuckDB on the same parquet data."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare, duck_connection, first_diff

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# Builders are side-effectful (streaming gates run bounded replays, the
# roundtrip gates write temp dirs) — build each gate's DataFrame ONCE and
# share it across the oracle / rows-only / scalar-lint tests instead of
# re-running the replica work per parametrized test (code-review r6).
_DF_CACHE: dict[str, object] = {}


def _gate_df(spark, name):
    if name not in _DF_CACHE:
        _DF_CACHE[name] = QUERIES[name](spark, SF_DIR)
    return _DF_CACHE[name]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    df = _gate_df(spark, name)
    res = compare(df, duck, ORACLES[name])
    if not res["hash_match"]:
        diff = first_diff(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
        pytest.fail(f"{name}: {res}\ndiff: {diff}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _gate_df(spark, name)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_gate_outputs_are_scalar(spark, name):
    """Driver-canonicalizer contract: gate outputs must be scalar columns
    only. The r5 driver run ERRed five gates whose outputs carried
    array<double> cells — pandas sort_values raises `unhashable type:
    'list'` in the driver's hasher (the local harness canonicalizes lists,
    which is exactly how the gap shipped). This lint closes the class:
    every queries() entry must posexplode/flatten complex values."""
    from pyspark.sql import types as T

    df = _gate_df(spark, name)
    bad = [f"{f.name}: {f.dataType.simpleString()}" for f in df.schema.fields
           if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))]
    assert not bad, (f"{name} returns non-scalar column(s) {bad}; the "
                     "driver canonicalizer cannot hash these — scalarize "
                     "(posexplode / per-component columns)")

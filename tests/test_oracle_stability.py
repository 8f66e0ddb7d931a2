"""Oracle-stability pin (r10).

The r9 `unigram_segments` driver red was NOT a Spark bug: the DuckDB
oracle's list_reduce backtrace — a lambda correlating three outer list
columns — returned different results across fresh connections at full
cardinality. A single-run compare can never see that class of defect,
so tools/sweep.py grew a stability tier (every list_reduce-bearing
oracle executed N× in fresh connections, all value hashes must agree).

This test pins the incident class: the unigram family plus
simhash_pairs (the other multi-fold list_reduce oracle) must be
run-stable at the driver's sf0.01. The FULL 13-oracle tier runs inside
every `tools/sweep.py` full sweep; this in-suite subset keeps the worst
offenders guarded without adding minutes of ANN-oracle time to pytest.
"""

from __future__ import annotations

import importlib
import sys

PINNED = ["unigram_segments", "unigram_train", "simhash_pairs"]


@__import__('pytest').mark.nightly  # 3x oracle reruns, ~29 s (r13 tier split)
def test_incident_class_oracles_are_run_stable():
    sys.path.insert(0, "/root/repo")
    em = importlib.import_module("__spark_entry__")
    sweep = importlib.import_module("tools.sweep")

    osql = em.oracle_sql()
    for name in PINNED:
        assert "list_reduce" in osql[name], (
            f"{name} no longer list_reduce-bearing — update PINNED")
    res = sweep.stability_tier(osql, runs=3, only=set(PINNED))
    assert set(res) == set(PINNED)
    unstable = {n: r for n, r in res.items() if not r.get("stable")}
    assert not unstable, unstable


def test_no_oracle_output_column_is_hugeint():
    """r12 driver red (phash_dihedral): an un-cast SUM(BIGINT) made the
    output `phash` column HUGEINT. duckdb's fetchall() returns exact
    Python ints (so local sweeps passed), but pandas/numpy fetch paths
    convert HUGEINT to float64, losing bits above 2^53 — an
    environment-sensitive hash divergence. Pin: no oracle may expose a
    HUGEINT/UHUGEINT (or wide-DECIMAL) output column; cast to BIGINT
    (exact for every value the engine emits) before the final SELECT.

    Type inspection only (`LIMIT 0`-style prepare via .types) — runs in
    seconds over all 250 oracles at sf0.001.
    """
    sys.path.insert(0, "/root/repo")
    em = importlib.import_module("__spark_entry__")
    harness = importlib.import_module("tests.oracle_harness")

    con = harness.duck_connection("/root/testdata/sf0.001")
    offenders = {}
    for name, sql in em.oracle_sql().items():
        rel = con.sql(sql)
        sus = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT")
               or (str(t).startswith("DECIMAL(") and
                   int(str(t).split("(")[1].split(",")[0]) > 15)]
        if sus:
            offenders[name] = sus
    assert not offenders, offenders

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

"""Staged live-environment activation tests (r9 verdict item 7).

The sandbox has no network, so three integration surfaces are gated
behind honest NotImplementedError/ImportError boundaries today:
the BigQuery connector write (sinks.write_bigquery), Delta MERGE
(operators.merge.merge_into fmt='delta'), and Iceberg MERGE. These
tests are skip-marked on the AVAILABILITY PROBE, not hardcoded skips —
the moment the environment provides the jar/package they run for real,
flipping S5 (and the table-format merges) from emulated to live with
zero code changes. Until then each test's skip reason records exactly
what is missing.

Also pins the negative contract we rely on TODAY: with the jar absent,
write_bigquery must fail with the descriptive NotImplementedError (not
a raw ClassNotFoundException), and fmt='delta' must raise the
descriptive ImportError.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F


def _jvm_class_present(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def _has_delta() -> bool:
    return importlib.util.find_spec("delta") is not None


# ---- negative contracts (always run: the sandbox state) -------------------

def test_write_bigquery_raises_descriptively_without_jar(spark):
    from bqetl_spark.sources.sinks import write_bigquery

    if _jvm_class_present(
            spark, "com.google.cloud.spark.bigquery.BigQueryRelationProvider"):
        pytest.skip("connector jar present — the live test below covers it")
    df = spark.range(3).select(F.col("id").cast("long"))
    with pytest.raises(NotImplementedError, match="spark-bigquery-connector"):
        write_bigquery(df, "proj.ds.tbl", temp_bucket="bucket")


def test_merge_into_delta_raises_descriptively_without_package(spark,
                                                               tmp_path):
    from bqetl_spark.operators.merge import merge_into

    if _has_delta():
        pytest.skip("delta-spark present — the live test below covers it")
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    base.write.parquet(str(tmp_path / "t"))
    with pytest.raises(ImportError, match="delta-spark"):
        merge_into(spark, str(tmp_path / "t"),
                   spark.createDataFrame([(1, "b")], ["k", "v"]),
                   "k", fmt="delta")


# ---- live activations (run iff the environment provides the piece) --------

@pytest.mark.skipif(
    importlib.util.find_spec("delta") is None,
    reason="delta-spark not installed (offline sandbox); install it and "
           "this MERGE test runs for real")
def test_delta_merge_live(spark, tmp_path):
    """Real transactional MERGE INTO through merge_into's Delta branch;
    result must equal the format-agnostic upsert emulation row for row."""
    from bqetl_spark.operators.merge import merge_into, upsert

    target = str(tmp_path / "delta_t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    base.write.format("delta").save(target)
    changes = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    got = {(r["k"], r["v"]) for r in
           merge_into(spark, target, changes, "k", fmt="delta").collect()}
    want = {(r["k"], r["v"]) for r in upsert(base, changes, "k").collect()}
    assert got == want == {(1, "a"), (2, "B"), (3, "c")}


def test_iceberg_merge_live(spark, tmp_path):
    """Real Iceberg MERGE INTO via SQL against a local hadoop catalog —
    fully offline once the iceberg-spark-runtime jar is on the
    classpath."""
    if not _jvm_class_present(spark, "org.apache.iceberg.spark.SparkCatalog"):
        pytest.skip("iceberg-spark-runtime jar absent (offline sandbox); "
                    "put it on spark.jars and this runs for real")
    spark.conf.set("spark.sql.catalog.local_ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local_ice.warehouse",
                   str(tmp_path / "wh"))
    spark.sql("CREATE TABLE local_ice.db.t (k BIGINT, v STRING) "
              "USING iceberg")
    spark.sql("INSERT INTO local_ice.db.t VALUES (1, 'a'), (2, 'b')")
    spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]) \
        .createOrReplaceTempView("changes")
    spark.sql("MERGE INTO local_ice.db.t t USING changes s ON t.k = s.k "
              "WHEN MATCHED THEN UPDATE SET * "
              "WHEN NOT MATCHED THEN INSERT *")
    got = {(r["k"], r["v"]) for r in
           spark.sql("SELECT * FROM local_ice.db.t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_bigquery_write_live(spark):
    """With the connector jar present the write path must get PAST the
    class-loading boundary: either the save succeeds (credentialed
    environment) or it fails with a connector/credentials error — never
    the jar-absent NotImplementedError."""
    if not _jvm_class_present(
            spark, "com.google.cloud.spark.bigquery.BigQueryRelationProvider"):
        pytest.skip("spark-bigquery-connector jar absent (offline "
                    "sandbox); add spark.jars.packages and this runs")
    from bqetl_spark.sources.sinks import write_bigquery

    df = spark.range(3).select(F.col("id").cast("long"))
    try:
        write_bigquery(df, "bqetl_test.ds.activation_probe",
                       temp_bucket="bqetl-test-bucket")
    except NotImplementedError:
        pytest.fail("jar present but write still hit the jar-absent "
                    "boundary — the gate in write_bigquery is stale")
    except Exception:
        pass  # credentials/network errors are expected without a project

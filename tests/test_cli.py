"""CLI parity (run.sh:17-34, BQETLOptions.java:23-48) and the BigQuery
sink's write contract.

The connector jar isn't in this environment, so the BigQuery test swaps a
recording writer in for ``DataFrame.write`` and asserts the exact
format/mode/options/table the sink builds — the code path executes fully,
only the final Java save is faked.
"""

import pytest

from bqetl_spark.plans.etl_simple import simple_output_schema
from bqetl_spark.sources.sinks import bigquery_write_plan, write_bigquery
from bqetl_spark.__main__ import build_parser, run
from tests.conftest import EXPECTED_CHILDREN, EXPECTED_JOIN_ROWS


class _RecordingWriter:
    def __init__(self, calls):
        self.calls = calls

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def mode(self, mode):
        self.calls["mode"] = mode
        return self

    def option(self, key, val):
        self.calls.setdefault("options", {})[key] = val
        return self

    def save(self, table):
        self.calls["save"] = table


def test_bigquery_write_plan_contract():
    plan = bigquery_write_plan("proj.ds.recordings_by_artist",
                               temp_bucket="stage-bkt")
    assert plan == {
        "format": "bigquery",
        "mode": "overwrite",          # WRITE_TRUNCATE (BQETLSimple.java:117)
        "save": "proj.ds.recordings_by_artist",
        "options": {"writeMethod": "indirect",
                    "temporaryGcsBucket": "stage-bkt"},
    }
    assert bigquery_write_plan("t")["options"] == {"writeMethod": "direct"}
    with pytest.raises(ValueError):
        bigquery_write_plan("t", mode="replace")


def test_write_bigquery_builds_reference_writer(spark, monkeypatch):
    """write_bigquery executes end-to-end against a recording writer: the
    declared schema is projected (S5 semantics) and the writer receives
    exactly the plan's format/mode/options/table."""
    calls = {}
    df = spark.createDataFrame([(7, "x", "extra")], ["artist_id", "artist_name", "junk"])
    # patch the CONCRETE class: Spark 4's classic DataFrame subclass
    # overrides the pyspark.sql.DataFrame `write` property
    monkeypatch.setattr(
        type(df), "write",
        property(lambda self: _RecordingWriter(calls)))
    write_bigquery(df, "musicbrainz_recordings_by_artist",
                   schema=simple_output_schema(lookups=True),
                   temp_bucket="stage")
    assert calls["format"] == "bigquery"
    assert calls["mode"] == "overwrite"
    assert calls["save"] == "musicbrainz_recordings_by_artist"
    assert calls["options"] == {"writeMethod": "indirect",
                                "temporaryGcsBucket": "stage"}


def test_cli_parser_surface():
    args = build_parser().parse_args(
        ["simple-with-lookups", "--loading-bucket-url", "/b",
         "--output", "/o", "--append"])
    assert args.pipeline == "simple-with-lookups"
    assert args.append and not args.perform_lookups
    with pytest.raises(SystemExit):   # unknown pipeline name rejected
        build_parser().parse_args(["fancy", "--loading-bucket-url", "b",
                                   "--output", "o"])


def test_cli_simple_end_to_end(spark, mb_bucket, tmp_path):
    out = str(tmp_path / "flat")
    rc = run(["simple-with-lookups",
              "--loading-bucket-url", mb_bucket,
              "--output", out], spark=spark)
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() == EXPECTED_JOIN_ROWS
    # lookups decoded: the FK columns came back as strings
    assert dict(back.dtypes)["artist_area"] == "string"


def test_cli_nested_end_to_end(spark, mb_bucket, tmp_path):
    out = str(tmp_path / "nested")
    rc = run(["nested", "--loading-bucket-url", mb_bucket,
              "--output", out, "--nesting-limit", "5"], spark=spark)
    assert rc == 0
    back = spark.read.parquet(out)
    # artists with >limit children split into extra rows; artist 1003 has
    # no credits and still appears (left join semantics)
    import math
    expected_rows = sum(max(1, math.ceil(n / 5))
                        for n in EXPECTED_CHILDREN.values())
    assert back.count() == expected_rows
    sizes = {r["artist_id"]: r for r in back.collect()}
    assert sizes[1003]["artist_recordings"] == []


def test_cli_corpus_pipeline_end_to_end(spark, tmp_path):
    from bqetl_spark.__main__ import run
    from tests.conftest import SF_DIR

    out = str(tmp_path / "corpus")
    rc = run(["corpus",
              "--loading-bucket-url", f"{SF_DIR}/documents.parquet",
              "--output", out, "--chunk-size", "32", "--pack-budget", "512"],
             spark=spark)
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() > 0
    rows = back.collect()
    # chunk invariants survive the full pipeline + partitioned write
    assert all(1 <= r["n_tokens"] <= 32 for r in rows)
    assert all(r["pack_id"] >= 0 for r in rows)
    # curated docs are unique post-dedup (no doc appears with two sources)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["source"])
    assert all(len(s) == 1 for s in by_doc.values())


def test_corpus_pipeline_shard_layout(spark, tmp_path):
    """--shards trainer layout: shard=K dirs, deterministic chunk-level
    membership (same chunk -> same shard on a re-run)."""
    import glob

    from bqetl_spark.plans.corpus_pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.limit(300).write.parquet(src)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    n1 = run_corpus_pipeline(spark, src, out1, n_shards=4)
    assert n1 > 0
    assert sorted(int(p.split("=")[1])
                  for p in glob.glob(f"{out1}/shard=*")) == [0, 1, 2, 3]
    run_corpus_pipeline(spark, src, out2, n_shards=4)
    a = sorted(map(tuple, spark.read.parquet(out1)
                   .select("doc_id", "chunk_id", "shard").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2)
                   .select("doc_id", "chunk_id", "shard").collect()))
    assert a == b


def test_sql_frontdoor_views_and_pushdown(spark):
    """register_star creates lazy views; a raw-SQL query over them gets
    the same Catalyst treatment (broadcast join for the dims) as the
    DataFrame surface."""
    from bqetl_spark import sql as sq
    from tests.conftest import SF_DIR

    names = sq.register_star(spark, SF_DIR)
    assert "orders" in names and "nation" in names
    df = spark.sql("SELECT count(*) AS n FROM orders")
    assert df.first()["n"] > 0
    joined = sq.sql(spark, SF_DIR, """
        SELECT n_name, count(*) AS n FROM customer
        JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.count() > 0

"""compact_parquet: file-granularity, value-invisibility, clustering."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from bqetl_spark.sources.compaction import compact_parquet, parquet_bytes
from tests.conftest import SF_DIR


def _nfiles(path):
    return len(glob.glob(f"{path}/part-*.parquet"))


def test_compaction_reduces_file_count_and_preserves_values(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frag = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(frag)
    assert _nfiles(frag) == 40
    out = str(tmp_path / "out")
    back = compact_parquet(spark, frag, out, target_bytes=1 << 30)
    assert _nfiles(out) == 1  # everything fits one target-sized file
    a = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert a == b


def test_file_count_tracks_target_bytes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frag = str(tmp_path / "frag2")
    docs.repartition(16).write.parquet(frag)
    total = parquet_bytes(frag)
    target = max(1, total // 4)
    out = str(tmp_path / "out2")
    compact_parquet(spark, frag, out, target_bytes=target)
    want = -(-total // target)
    assert _nfiles(out) == want


def test_sorted_compaction_tightens_footer_stats(spark, tmp_path):
    """With sort_cols, compaction is also a clustering pass: each output
    file's doc_id min/max ranges must be disjoint (range partitioning),
    which is what makes footer-based file skipping effective."""
    import pyarrow.parquet as pq

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frag = str(tmp_path / "frag3")
    docs.repartition(16).write.parquet(frag)
    out = str(tmp_path / "out3")
    total = parquet_bytes(frag)
    compact_parquet(spark, frag, out, target_bytes=max(1, total // 4),
                    sort_cols=["doc_id"])
    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        t = pq.read_table(f, columns=["doc_id"]).to_pydict()["doc_id"]
        if t:
            spans.append((min(t), max(t)))
    spans.sort()
    assert len(spans) >= 2
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo  # disjoint ranges -> tight min/max per file


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_parquet(spark, str(tmp_path), str(tmp_path / "x"),
                        target_bytes=0)


def test_in_place_compaction_refused(spark, tmp_path):
    """ADVICE r5: the overwrite write reads src lazily, so src == dst
    would truncate the data mid-scan; must refuse, including via
    symlink/relative aliases."""
    src = tmp_path / "t"
    spark.range(10).write.parquet(str(src))
    with pytest.raises(ValueError, match="src == dst"):
        compact_parquet(spark, str(src), str(src))
    with pytest.raises(ValueError, match="src == dst"):
        compact_parquet(spark, str(src), str(tmp_path / "." / "t"))


def test_split_up_when_fewer_input_partitions(spark, tmp_path):
    """ADVICE r5: coalesce cannot increase partition count — one big
    input file targeted at small output files must repartition UP so
    output file sizes track target_bytes."""
    import glob

    src, dst = tmp_path / "big", tmp_path / "out"
    spark.range(200_000).selectExpr(
        "id", "repeat(uuid(), 4) AS pad").coalesce(1).write.parquet(str(src))
    from bqetl_spark.sources.compaction import parquet_bytes
    total = parquet_bytes(str(src))
    out = compact_parquet(spark, str(src), str(dst),
                          target_bytes=max(total // 4, 1))
    n_out = len(glob.glob(str(dst / "*.parquet")))
    assert n_out >= 3  # split upward from 1 input file
    assert out.count() == 200_000

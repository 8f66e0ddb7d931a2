import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions import multimodal as mm


def _media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "binary-ish payload content")],
        ["doc_id", "text"])
    return mm.attach_media(df, "doc_id", F.encode(F.col("text"), "UTF-8"),
                           kind="image", fmt="png")


def test_media_schema_shape(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("media_id = 1").first()
    assert row["meta"]["kind"] == "image" and row["meta"]["format"] == "png"


def test_extract_features_stub_raises(spark):
    media = _media(spark)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        mm.extract_features(media, fake=False).collect()


def test_extract_features_fake_deterministic(spark):
    media = _media(spark)
    out = {r["media_id"]: r for r in mm.extract_features(media, fake=True).collect()}
    assert out[1]["n_bytes"] == len(b"hello world")
    assert len(out[1]["feature"]) == 8
    assert out[2]["feature"] == [0.0] * 8
    # determinism across runs
    again = {r["media_id"]: r for r in mm.extract_features(media, fake=True).collect()}
    assert out[1]["feature"] == again[1]["feature"]


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, "vid")], ["doc_id", "text"])
    media = mm.attach_media(df, "doc_id", F.encode(F.col("text"), "UTF-8"),
                            kind="video", fmt="mp4")
    media = media.withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(3500).cast("long")))
    out = mm.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["sample_ts_ms"] for r in sorted(out, key=lambda r: r["sample_ts_ms"])] == \
        [0, 1000, 2000, 3000]


def test_resize_fake_sets_dims_and_payload_size(spark):
    from pyspark.sql import functions as F
    from bqetl_spark.functions.multimodal import attach_media, resize_images
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = attach_media(docs, "doc_id", F.encode(F.col("text"), "UTF-8"),
                         kind="image", fmt="png")
    out = resize_images(media, width=16, height=8, fake=True).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["payload"]) == 16 * 8
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 8
        assert r["meta"]["kind"] == "image"  # rest of meta preserved
    # deterministic: same input -> same bytes
    again = resize_images(media, width=16, height=8, fake=True).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == \
           {r["media_id"]: bytes(r["payload"]) for r in again}


def test_resize_stub_raises_without_fake(spark):
    import pytest
    from pyspark.sql import functions as F
    from bqetl_spark.functions.multimodal import attach_media, resize_images
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(2)
    media = attach_media(docs, "doc_id", F.encode(F.col("text"), "UTF-8"),
                         kind="image", fmt="png")
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        resize_images(media, 4, 4, fake=False).collect()

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is stubbed because
image/audio libraries are not in this container — ``decode_image`` raises
NotImplementedError unless ``fake=True``, which substitutes a deterministic
fake decoder so the pipeline shape can be exercised end-to-end.

Pattern: mapInPandas over batches of (id, media: binary, meta: struct) —
each Arrow batch decodes vectorized in Python, features return as typed
columns. At 100 TB, binary payloads should live in the lake as separate
column chunks (parquet stores them column-wise already), and the decode stage
should be sized by bytes (spark.sql.files.maxPartitionBytes) not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), True),      # image|audio|video
        T.StructField("format", T.StringType(), True),    # png|wav|mp4...
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def attach_media(df: DataFrame, id_col: str, payload_expr,
                 kind: str, fmt: str) -> DataFrame:
    """Build a media table shaped like MEDIA_SCHEMA from any source column
    (here: encode() of text in tests, real bytes in production)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload_expr.cast("binary").alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"), F.lit(fmt).alias("format"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, fake: bool = False,
                     n_feat: int = 8) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched; one Python
    round-trip per batch, not per row).

    The UDF closure is deliberately SELF-CONTAINED (nested defs, no
    module-level references): cloudpickle then ships it by value, so Spark's
    Python workers don't need this package importable on their sys.path —
    which is exactly the situation when a host application drives the engine
    from outside the repo directory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import, always available with pyspark

        def decode_fake(payload):
            if payload is None or len(payload) == 0:
                return [0.0] * n_feat
            acc = [0.0] * n_feat
            for i, b in enumerate(payload):
                acc[i % n_feat] += b
            n = float(len(payload))
            return [round(a / n, 6) for a in acc]

        def decode_stub(payload):
            raise NotImplementedError(
                "media decode requires an image/audio library (PIL/librosa/"
                "ffmpeg) not present in this container; pass fake=True for "
                "the deterministic fake decoder")

        decode = decode_fake if fake else decode_stub
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (decode itself stubbed). Demonstrates the explode-by-sequence shape that
    a real frame extractor plugs into."""
    return (media
            .filter(F.col("meta.kind") == "video")
            .withColumn("sample_ts_ms",
                        F.explode(F.sequence(F.lit(0),
                                             F.coalesce(F.col("meta.duration_ms"),
                                                        F.lit(0)),
                                             F.lit(every_ms))))
            .select("media_id", "sample_ts_ms"))


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Image resize via mapInPandas, returning a MEDIA_SCHEMA-shaped table
    with the payload replaced and meta.width/height set.

    Real decode+resample needs PIL (absent from this container), so the
    stub raises unless ``fake=True``; the fake produces a deterministic
    width*height-byte payload (input bytes tiled/truncated), which keeps
    the batch shape, sizes, and schema of the real path so the Spark-side
    plumbing is fully exercised. Map-only: resizing 100 TB of images is a
    pure scan sized by bytes, not rows."""

    def run(batches):
        import pandas as _pd

        target = width * height

        def resize_fake(payload):
            if payload is None or len(payload) == 0:
                return bytes(target)
            reps = -(-target // len(payload))  # ceil
            return (bytes(payload) * reps)[:target]

        def resize_stub(payload):
            raise NotImplementedError(
                "image resize requires PIL, not present in this container; "
                "pass fake=True for the deterministic fake resizer")

        resize = resize_fake if fake else resize_stub
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(resize)
            out["meta"] = pdf["meta"].map(
                lambda m: {**(m if isinstance(m, dict) else m.asDict()),
                           "width": width, "height": height})
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)

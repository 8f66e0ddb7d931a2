"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decoding tiers:

- REAL pure-Python decoders for the three public uncompressed formats
  that need no external library: binary PPM (P6), 24-bit BMP, and 16-bit
  PCM WAV (:func:`decode_ppm` / :func:`decode_bmp` / :func:`decode_wav`).
  ``extract_features`` uses them for ``meta.format in ('ppm','bmp',
  'wav')``.
- compressed formats (png/jpeg/mp3/mp4) still raise NotImplementedError —
  their codecs (zlib-DEFLATE aside, DCT/entropy coders) are library
  territory and absent from this container; ``fake=True`` substitutes a
  deterministic fake decoder so those pipeline shapes stay exercised.

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


def _build_decoders():
    """Real decoders as CLOSURE-LOCAL defs: their __qualname__ is not
    importable, so cloudpickle ships them BY VALUE into UDF closures —
    Spark's Python workers never need this package on their sys.path
    (the same external-driver constraint the other UDF factories in this
    repo document)."""

    def decode_ppm(payload):
        """Binary PPM (P6) → (width, height, RGB bytes). Pure Python over
        the public netpbm spec: 'P6', ASCII width/height/maxval separated
        by whitespace (with '#' comments), ONE whitespace byte, then
        3*w*h raw sample bytes (maxval < 256)."""
        if payload is None or bytes(payload[:2]) != b"P6":
            raise ValueError("not a binary PPM (missing P6 magic)")
        payload = bytes(payload)
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if not (0 < maxval < 256):
            raise ValueError(f"unsupported PPM maxval {maxval}")
        need = 3 * w * h
        pix = payload[pos:pos + need]
        if len(pix) != need:
            raise ValueError(f"truncated PPM: want {need}, got {len(pix)}")
        return w, h, pix

    def decode_bmp(payload):
        """Uncompressed 24-bit BMP → (width, height, RGB bytes, top-down).
        Pure Python over the public BMP layout: 14-byte file header ('BM',
        pixel-array offset at byte 10), BITMAPINFOHEADER (width/height
        int32 at 18/22, bpp uint16 at 28 must be 24, compression uint32 at
        30 must be 0=BI_RGB). Rows bottom-up (negative height = top-down),
        4-byte padded, samples BGR."""
        import struct

        if payload is None or bytes(payload[:2]) != b"BM":
            raise ValueError("not a BMP (missing BM magic)")
        payload = bytes(payload)
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h_raw = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bpp BI_RGB supported, got bpp={bpp} "
                             f"compression={comp}")
        h, bottom_up = abs(h_raw), h_raw > 0
        stride = (3 * w + 3) & ~3
        if len(payload) < off + stride * h:
            raise ValueError("truncated BMP pixel array")
        rows = []
        for r in range(h):
            src = h - 1 - r if bottom_up else r
            row = bytearray(payload[off + src * stride:
                                    off + src * stride + 3 * w])
            row[0::3], row[2::3] = row[2::3], row[0::3]   # BGR -> RGB
            rows.append(bytes(row))
        return w, h, b"".join(rows)

    def decode_wav(payload):
        """PCM WAV (RIFF) → (n_channels, sample_rate, samples[int], ...).
        Pure Python over the public RIFF/WAVE layout: 'RIFF'+size+'WAVE',
        then chunks; 'fmt ' carries audio_format (must be 1 = PCM),
        channels, rate, bits (16-bit LE signed supported); 'data' carries
        the interleaved samples. Unknown chunks are skipped by size."""
        import struct

        if payload is None or bytes(payload[:4]) != b"RIFF" \
                or bytes(payload[8:12]) != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        payload = bytes(payload)
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            sz = struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8:pos + 8 + sz]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)          # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_format, n_ch, rate, _brate, _balign, bits = fmt
        if audio_format != 1 or bits != 16:
            raise ValueError(f"only 16-bit PCM supported, got "
                             f"format={audio_format} bits={bits}")
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[:2 * n]))
        return n_ch, rate, samples

    def audio_features(n_ch, rate, samples):
        """8-dim feature vector, EXACT arithmetic (integer sums, one final
        IEEE division; sqrt is IEEE-correctly-rounded in every engine):
        [n_channels, sample_rate, n_frames, duration_ms, mean_sample,
        min_sample, max_sample, rms]."""
        import math

        n_frames = len(samples) // n_ch
        if not samples:
            return [float(n_ch), float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        s = [int(x) for x in samples]
        return [float(n_ch), float(rate), float(n_frames),
                float(n_frames * 1000 // rate),
                sum(s) / len(s), float(min(s)), float(max(s)),
                math.sqrt(sum(x * x for x in s) / len(s))]

    def image_features(w, h, rgb):
        """8-dim feature vector from decoded RGB pixels, EXACT arithmetic:
        every aggregate is an integer sum with one final IEEE division, so
        the result is bit-reproducible across engines (the gate oracle
        recomputes it in SQL): [w, h, mean_r, mean_g, mean_b, min_lum,
        max_lum, mean_lum] with lum = per-pixel (r+g+b)/3."""
        import numpy as np

        a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        npix = a.shape[0]
        if npix == 0:
            return [float(w), float(h)] + [0.0] * 6
        csum = a.sum(axis=0)                   # exact int sums per channel
        psum = a.sum(axis=1)                   # per-pixel r+g+b (int)
        return [float(w), float(h),
                int(csum[0]) / npix, int(csum[1]) / npix, int(csum[2]) / npix,
                int(psum.min()) / 3.0, int(psum.max()) / 3.0,
                int(csum.sum()) / (3.0 * npix)]

    return decode_ppm, decode_bmp, image_features, decode_wav, audio_features


(decode_ppm, decode_bmp, image_features,
 decode_wav, audio_features) = _build_decoders()


def extract_features(media: DataFrame, fake: bool = False,
                     n_feat: int = 8) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched; one Python
    round-trip per batch, not per row).

    ``fake=False`` REALLY decodes ``meta.format in ('ppm','bmp')`` with the
    pure-Python decoders above and computes :func:`image_features`
    (integer-exact, so the driver gate hash-checks the vectors against a
    SQL oracle); other formats raise NotImplementedError (their codecs need
    libraries absent from this container). ``fake=True`` keeps the
    deterministic fake for exercising those pipeline shapes.

    The UDF closure is SELF-CONTAINED (nested/by-value defs only), so
    Spark's Python workers don't need this package importable on their
    sys.path — the external-driver situation.
    """
    ppm, bmp, feats_of = decode_ppm, decode_bmp, image_features  # by-value
    wav, afeats_of = decode_wav, audio_features

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

        real = {"ppm": ppm, "bmp": bmp}

        def decode(payload, meta):
            if fake:
                return decode_fake(payload)
            fmt = (meta or {}).get("format")
            if fmt == "wav":
                f = afeats_of(*wav(payload))
                return (f + [0.0] * n_feat)[:n_feat]
            dec = real.get(fmt)
            if dec is None:
                raise NotImplementedError(
                    f"no pure-Python decoder for format {fmt!r}: compressed "
                    "codecs (png/jpeg/wav/mp4) need media libraries absent "
                    "from this container; pass fake=True for the "
                    "deterministic fake decoder, or use 'ppm'/'bmp'")
            f = feats_of(*dec(payload))
            return (f + [0.0] * n_feat)[:n_feat]

        for pdf in batches:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["meta"])]
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


def sample_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video-ish frame sampling over PPM STREAMS — concatenated P6
    images, the public convention ffmpeg's ``image2pipe`` emits — taking
    every ``every_n``-th frame and returning one FEATURE row per sampled
    frame: (media_id, frame_idx, n_bytes of the frame, feature) with the
    same integer-exact image statistics as ``extract_features``.

    One mapInPandas stage; a frame-level explode happens Python-side per
    Arrow batch (the output row count is frames/every_n per video, known
    shape). Decode failures surface as errors, not silent drops."""
    from pyspark.sql import types as TT

    ppm, feats_of = decode_ppm, image_features   # by-value closure bindings
    out_schema = TT.StructType([
        TT.StructField("media_id", TT.LongType(), False),
        TT.StructField("frame_idx", TT.LongType(), False),
        TT.StructField("n_bytes", TT.LongType(), True),
        TT.StructField("feature", TT.ArrayType(TT.DoubleType()), True),
    ])

    def frames_of(payload):
        """Split a concatenated-P6 payload into per-frame byte slices:
        decode each frame, then re-walk its header (same tokenizer as
        decode_ppm) to measure the exact consumed length — header length
        varies with the digit counts, so it cannot be assumed."""
        payload = bytes(payload or b"")
        pos, out = 0, []
        while pos < len(payload):
            sub = payload[pos:]
            w, h, pix = ppm(sub)
            p2, nfields = 2, 0
            while nfields < 3:
                while sub[p2:p2 + 1].isspace():
                    p2 += 1
                if sub[p2:p2 + 1] == b"#":
                    while p2 < len(sub) and sub[p2] != 0x0A:
                        p2 += 1
                    continue
                while p2 < len(sub) and not sub[p2:p2 + 1].isspace():
                    p2 += 1
                nfields += 1
            p2 += 1                       # single whitespace after maxval
            frame_len = p2 + 3 * w * h
            out.append((payload[pos:pos + frame_len], w, h, pix))
            pos += frame_len
        return out

    def run(batches):
        import pandas as _pd

        rows = {"media_id": [], "frame_idx": [], "n_bytes": [],
                "feature": []}
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, (frame, w, h, pix) in enumerate(frames_of(payload)):
                    if idx % every_n:
                        continue
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["n_bytes"].append(len(frame))
                    rows["feature"].append(feats_of(w, h, pix))
        # explicit object dtype: an EMPTY partition would otherwise give
        # the feature column float64 dtype, which Arrow refuses to cast
        # to list<double>
        yield _pd.DataFrame({
            "media_id": _pd.Series(rows["media_id"], dtype="int64"),
            "frame_idx": _pd.Series(rows["frame_idx"], dtype="int64"),
            "n_bytes": _pd.Series(rows["n_bytes"], dtype="int64"),
            "feature": _pd.Series(rows["feature"], dtype="object"),
        })

    return (media.filter(F.col("meta.format") == "ppms")
            .mapInPandas(run, schema=out_schema))


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Image resize via mapInPandas, returning a MEDIA_SCHEMA-shaped table
    with the payload replaced and meta.width/height set.

    ``fake=False`` REALLY resizes ``meta.format == 'ppm'`` payloads:
    decode_ppm → NEAREST-NEIGHBOR resample (source index =
    ``floor(dst_index * src_extent / dst_extent)`` per axis — integer
    arithmetic, no interpolation rounding, so the output bytes are
    reproducible in SQL) → re-encoded P6. Other formats still raise
    (their codecs need PIL, absent from this container); ``fake=True``
    keeps the deterministic tiled-bytes fake for those pipeline shapes.
    Map-only: resizing 100 TB of images is a pure scan sized by bytes,
    not rows."""
    ppm = decode_ppm  # closure-local binding → shipped by value

    def run(batches):
        import pandas as _pd

        target = width * height

        def resize_fake(payload, _meta):
            if payload is None or len(payload) == 0:
                return bytes(target)
            reps = -(-target // len(payload))  # ceil
            return (bytes(payload) * reps)[:target]

        def resize_real(payload, meta):
            fmt = (meta or {}).get("format")
            if fmt != "ppm":
                raise NotImplementedError(
                    f"no pure-Python resampler for format {fmt!r} (needs "
                    "PIL); use 'ppm' or pass fake=True")
            import numpy as np
            w0, h0, rgb = ppm(payload)
            a = np.frombuffer(rgb, dtype=np.uint8).reshape(h0, w0, 3)
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            out = a[ys][:, xs]
            return (b"P6\n%d %d\n255\n" % (width, height)
                    + out.tobytes())

        resize = resize_fake if fake else resize_real
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [resize(p, m)
                              for p, m in zip(pdf["payload"], pdf["meta"])]
            out["meta"] = pdf["meta"].map(
                lambda m: {**(m if isinstance(m, dict) else m.asDict()),
                           "width": width, "height": height})
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)

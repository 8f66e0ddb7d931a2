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
    """mp3/mp4 stay honestly gated (perceptual codecs need external
    libs); jpeg is REAL as of r7 and png as of r6, so mislabeled garbage
    payloads now raise the decoders' signature errors rather than
    NotImplementedError."""
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    mp3 = mm.attach_media(df, "doc_id", F.encode(F.col("text"), "UTF-8"),
                          kind="audio", fmt="mp3")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        mm.extract_features(mp3, fake=False).collect()
    jpeg = mm.attach_media(df, "doc_id", F.encode(F.col("text"), "UTF-8"),
                           kind="image", fmt="jpeg")
    with pytest.raises(Exception, match="not a JPEG"):
        mm.extract_features(jpeg, fake=False).collect()
    media = _media(spark)  # fmt="png", garbage payload
    with pytest.raises(Exception, match="not a PNG"):
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


def _ppm(w, h, pix: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pix


def _bmp24(w, h, rgb_rows_topdown: list[bytes]) -> bytes:
    """Minimal uncompressed 24-bpp BMP writer (bottom-up, 4-byte padded,
    BGR) — golden fixture built independently of the decoder."""
    import struct

    stride = (3 * w + 3) & ~3
    pad = b"\x00" * (stride - 3 * w)
    body = b""
    for row in reversed(rgb_rows_topdown):          # bottom-up storage
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = bgr[2::3], bgr[0::3]
        body += bytes(bgr) + pad
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + body


def test_decode_ppm_golden():
    pix = bytes(range(2 * 2 * 3))                   # 2x2, samples 0..11
    w, h, rgb = mm.decode_ppm(_ppm(2, 2, pix))
    assert (w, h, rgb) == (2, 2, pix)
    # comments + multiple whitespace in header
    w, h, rgb = mm.decode_ppm(b"P6 # c\n# full line\n 2\t2 # w h\n255\n" + pix)
    assert (w, h, rgb) == (2, 2, pix)


def test_decode_ppm_errors():
    import pytest
    with pytest.raises(ValueError, match="P6 magic"):
        mm.decode_ppm(b"P3\n1 1\n255\n abc")
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_ppm(_ppm(2, 2, b"\x00" * 5))
    with pytest.raises(ValueError, match="maxval"):
        mm.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)


def test_decode_bmp_golden():
    rows = [bytes([255, 0, 0, 0, 255, 0]),          # red, green
            bytes([0, 0, 255, 10, 20, 30])]         # blue, grey-ish
    w, h, rgb = mm.decode_bmp(_bmp24(2, 2, rows))
    assert (w, h) == (2, 2)
    assert rgb == rows[0] + rows[1]                 # top-down RGB restored


def test_decode_bmp_errors():
    import pytest
    with pytest.raises(ValueError, match="BM magic"):
        mm.decode_bmp(b"XX" + b"\x00" * 60)
    good = _bmp24(2, 2, [b"\x00" * 6, b"\x00" * 6])
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_bmp(good[:-5])


def test_image_features_exact():
    # 1 pixel (10, 20, 30): means are the channel values, lum = 60/3
    f = mm.image_features(1, 1, bytes([10, 20, 30]))
    assert f == [1.0, 1.0, 10.0, 20.0, 30.0, 20.0, 20.0, 20.0]
    # 2 pixels: integer-sum/-division semantics
    f = mm.image_features(2, 1, bytes([0, 0, 0, 255, 255, 255]))
    assert f == [2.0, 1.0, 127.5, 127.5, 127.5, 0.0, 255.0, 127.5]


def test_extract_features_real_ppm_and_bmp(spark):
    pix = bytes(range(12))
    rows = [(1, _ppm(2, 2, pix), "ppm"),
            (2, _bmp24(2, 2, [pix[:6], pix[6:]]), "bmp")]
    df = spark.createDataFrame(rows, "media_id long, payload binary, fmt string")
    media = df.select(
        "media_id", "payload",
        F.struct(F.lit("image").alias("kind"), F.col("fmt").alias("format"),
                 F.lit(None).cast("long").alias("width"),
                 F.lit(None).cast("long").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))
    out = {r["media_id"]: r for r in
           mm.extract_features(media, fake=False).collect()}
    expected = mm.image_features(2, 2, pix)
    assert out[1]["feature"] == expected       # PPM path
    assert out[2]["feature"] == expected       # BMP path, same pixels
    assert out[1]["n_bytes"] == len(rows[0][1])


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


def _wav(n_ch, rate, samples) -> bytes:
    import struct
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch,
                          2 * n_ch, 16)
            + b"data" + len(data).to_bytes(4, "little") + data)


def test_decode_wav_golden():
    n_ch, rate, samples = mm.decode_wav(_wav(1, 8000, [100, -200, 300, 0]))
    assert (n_ch, rate, samples) == (1, 8000, [100, -200, 300, 0])
    # stereo + an unknown chunk before data is skipped by size
    raw = _wav(2, 44100, [1, -1, 32767, -32768])
    with_junk = raw[:12] + b"LIST" + (4).to_bytes(4, "little") + b"INFO" \
        + raw[12:]
    assert mm.decode_wav(with_junk) == (2, 44100, [1, -1, 32767, -32768])


def test_decode_wav_errors():
    import pytest
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        mm.decode_wav(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError, match="missing fmt"):
        mm.decode_wav(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    import struct
    bad = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"fmt "
           + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32
           + b"data" + (0).to_bytes(4, "little"))
    with pytest.raises(ValueError, match="16-bit PCM"):
        mm.decode_wav(bad)


def test_audio_features_exact():
    f = mm.audio_features(1, 8000, [3, -3, 4, -4])
    assert f[:4] == [1.0, 8000.0, 4.0, 0.0]      # 4 frames @ 8kHz -> 0 ms
    assert f[4] == 0.0 and f[5] == -4.0 and f[6] == 4.0
    assert f[7] == (25 / 2) ** 0.5               # rms of {3,3,4,4}


def test_extract_features_real_wav(spark):
    payload = _wav(1, 8000, list(range(8)))
    df = spark.createDataFrame([(7, payload)], "media_id long, payload binary")
    media = df.select(
        "media_id", "payload",
        F.struct(F.lit("audio").alias("kind"), F.lit("wav").alias("format"),
                 F.lit(None).cast("long").alias("width"),
                 F.lit(None).cast("long").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))
    out = mm.extract_features(media, fake=False).collect()[0]
    assert out["feature"] == mm.audio_features(1, 8000, list(range(8)))
    assert out["n_bytes"] == len(payload)


def test_resize_real_ppm_nearest_neighbor(spark):
    """Golden 2x2→1x1 and 2x2→4x4 nearest-neighbor resizes of a known
    image; payload is a valid re-encoded P6 that decode_ppm round-trips."""
    pix = bytes([10, 11, 12,  20, 21, 22,
                 30, 31, 32,  40, 41, 42])        # 2x2 RGB
    df = spark.createDataFrame([(1, _ppm(2, 2, pix))],
                               "media_id long, payload binary")
    media = df.select(
        "media_id", "payload",
        F.struct(F.lit("image").alias("kind"), F.lit("ppm").alias("format"),
                 F.lit(None).cast("long").alias("width"),
                 F.lit(None).cast("long").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))
    down = mm.resize_images(media, 1, 1, fake=False).collect()[0]
    w, h, rgb = mm.decode_ppm(bytes(down["payload"]))
    assert (w, h) == (1, 1) and rgb == pix[:3]    # src idx floor(0*2/1)=0
    assert down["meta"]["width"] == 1 and down["meta"]["height"] == 1
    up = mm.resize_images(media, 4, 4, fake=False).collect()[0]
    w, h, rgb = mm.decode_ppm(bytes(up["payload"]))
    assert (w, h) == (4, 4)
    # each source pixel replicated 2x2: row 0 = p0 p0 p1 p1
    assert rgb[0:6] == pix[0:3] * 2 and rgb[6:12] == pix[3:6] * 2


def test_sample_frames_ppm_stream(spark):
    """3-frame concatenated-P6 stream with DIFFERENT header digit widths
    (1x1, 10x1, 2x2) — the splitter must measure each header exactly."""
    f0 = _ppm(1, 1, bytes([1, 2, 3]))
    f1 = _ppm(10, 1, bytes(range(30)))
    f2 = _ppm(2, 2, bytes(range(12)))
    df = spark.createDataFrame([(5, f0 + f1 + f2)],
                               "media_id long, payload binary")
    media = df.select(
        "media_id", "payload",
        F.struct(F.lit("video").alias("kind"), F.lit("ppms").alias("format"),
                 F.lit(None).cast("long").alias("width"),
                 F.lit(None).cast("long").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))
    allf = {r["frame_idx"]: r for r in
            mm.sample_frames(media, every_n=1).collect()}
    assert set(allf) == {0, 1, 2}
    assert allf[0]["n_bytes"] == len(f0) and allf[2]["n_bytes"] == len(f2)
    assert allf[0]["feature"] == mm.image_features(1, 1, bytes([1, 2, 3]))
    assert allf[1]["feature"] == mm.image_features(10, 1, bytes(range(30)))
    every2 = {r["frame_idx"] for r in
              mm.sample_frames(media, every_n=2).collect()}
    assert every2 == {0, 2}


# --- PNG (r6: real compressed-format decode via stdlib zlib) -----------


def test_png_roundtrip_all_filters():
    """encode→decode must be the identity for every per-row filter type
    (none/sub/up/average/paeth are lossless predictors)."""
    import random

    from bqetl_spark.functions.multimodal import decode_png, encode_png

    rng = random.Random(42)
    w, h = 7, 10
    rgb = bytes(rng.randrange(256) for _ in range(3 * w * h))
    for filt in range(5):
        payload = encode_png(w, h, rgb, filters=[filt] * h)
        assert decode_png(payload) == (w, h, rgb), f"filter {filt}"
    # mixed pattern (the gate's r % 5 cycle)
    payload = encode_png(w, h, rgb, filters=[r % 5 for r in range(h)])
    assert decode_png(payload) == (w, h, rgb)


def test_png_color_types_gray_and_alpha():
    """Gray (0), gray+alpha (4) and RGBA (6) decode to RGB: gray
    replicates, alpha drops. Hand-built type-0-filtered scanlines."""
    import struct
    import zlib

    from bqetl_spark.functions.multimodal import decode_png

    def build(w, h, ctype, planes):
        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data)))
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        raw = b"".join(b"\x00" + planes[r * w * nch:(r + 1) * w * nch]
                       for r in range(h))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    assert decode_png(build(2, 1, 0, bytes([10, 200]))) == \
        (2, 1, bytes([10, 10, 10, 200, 200, 200]))
    assert decode_png(build(1, 1, 4, bytes([77, 128]))) == \
        (1, 1, bytes([77, 77, 77]))
    assert decode_png(build(1, 2, 6, bytes([1, 2, 3, 255, 9, 8, 7, 0]))) == \
        (1, 2, bytes([1, 2, 3, 9, 8, 7]))


def test_png_rejects_corruption_and_unsupported():
    import pytest as _pytest

    from bqetl_spark.functions.multimodal import decode_png, encode_png

    good = encode_png(2, 2, bytes(range(12)))
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        encode_png(2, 2, b"short")


def test_png_extract_features_matches_ppm(spark):
    """The SAME pixels through the PNG path and the PPM path must give
    identical integer-exact features — codec-independence of the feature
    contract."""
    from bqetl_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789XX")],
        "doc_id bigint, text string")
    png_media = mm.attach_png_media(docs, "doc_id", "text", 4, 3)
    png_feats = mm.extract_features(png_media, fake=False) \
        .select("media_id", "feature").collect()
    ppm_payload = F.concat(F.lit("P6\n4 3\n255\n").cast("binary"),
                           F.substring(F.col("text"), 1, 36).cast("binary"))
    ppm_media = mm.attach_media(docs, "doc_id", ppm_payload,
                                kind="image", fmt="ppm")
    ppm_feats = mm.extract_features(ppm_media, fake=False) \
        .select("media_id", "feature").collect()
    assert png_feats == ppm_feats


def test_png_roundtrip_hypothesis():
    """Property: encode→decode is the identity for ANY image dims,
    pixel bytes, and per-row filter assignment (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bqetl_spark.functions.multimodal import decode_png, encode_png

    @settings(max_examples=30, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 9),
           data=st.data())
    def run(w, h, data):
        rgb = bytes(data.draw(st.lists(st.integers(0, 255),
                                       min_size=3 * w * h,
                                       max_size=3 * w * h)))
        filters = data.draw(st.lists(st.integers(0, 4),
                                     min_size=h, max_size=h))
        payload = encode_png(w, h, rgb, filters=filters)
        assert decode_png(payload) == (w, h, rgb)

    run()


def test_png_gate_ascii_boundary_is_explicit(spark):
    """ADVICE r6: the PNG/PPM gates slice BYTES while their oracles read
    per-character ord(); the gates now require octet_length == char
    length over the prefix, so a non-ASCII doc is excluded identically
    on both sides instead of silently hashing differently."""
    from pyspark.sql import functions as F

    from bqetl_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "a" * 40), (2, "é" + "a" * 39), (3, "a" * 35 + "é" + "a" * 4)],
        "doc_id long, text string")
    kept = docs.filter(
        (F.length("text") >= 36)
        & (F.octet_length(F.substring("text", 1, 36)) == 36))
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # and the kept doc round-trips through the real PNG chain
    media = mm.attach_png_media(kept, "doc_id", "text", 4, 3)
    feats = mm.extract_features(media, fake=False).collect()
    assert len(feats) == 1 and feats[0]["feature"][0] == 4.0


# --- baseline JPEG codec (r7, pure Python over public ITU T.81) --------


def test_jpeg_block_constant_exact_roundtrip():
    """The gate's exactness contract: an image whose 8×8 blocks are each
    constant is DC-only, survives quantization exactly, and decodes to
    the source bytes bit-for-bit through the REAL lossy codec."""
    from bqetl_spark.functions.multimodal import (decode_jpeg,
                                                  encode_jpeg_gray)

    vals = [0, 255, 128, 1, 254, 127, 63, 192, 17, 200, 90, 33]
    bw, bh = 4, 3
    w, h = bw * 8, bh * 8
    gray = bytes(vals[(y // 8) * bw + (x // 8)]
                 for y in range(h) for x in range(w))
    W, H, rgb = decode_jpeg(encode_jpeg_gray(w, h, gray))
    assert (W, H) == (w, h)
    assert all(rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2] == gray[i]
               for i in range(w * h))


def test_jpeg_decoder_is_layout_agnostic():
    """The decoder is a general baseline decoder, not special-cased to
    constant blocks: an arbitrary image at quant=1 decodes within ±1
    (DCT int-rounding), and a REAL quantization table compresses and
    still decodes."""
    import random

    from bqetl_spark.functions.multimodal import (decode_jpeg,
                                                  encode_jpeg_gray)

    random.seed(11)
    w, h = 16, 16
    gray = bytes(random.randrange(256) for _ in range(w * h))
    _, _, rgb = decode_jpeg(encode_jpeg_gray(w, h, gray))
    assert max(abs(rgb[3 * i] - gray[i]) for i in range(w * h)) <= 1
    # lossy table: smaller payload, decode still runs and is bounded
    q = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
         92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
         100, 103, 99]
    lossy = encode_jpeg_gray(w, h, gray, quant=q)
    assert len(lossy) < len(encode_jpeg_gray(w, h, gray))
    _, _, rgb_l = decode_jpeg(lossy)
    assert len(rgb_l) == 3 * w * h


def test_jpeg_rejects_unsupported():
    import pytest

    from bqetl_spark.functions.multimodal import (decode_jpeg,
                                                  encode_jpeg_gray)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    jp = bytearray(encode_jpeg_gray(8, 8, bytes(range(64))))
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    idx = jp.find(b"\xFF\xC0")
    jp[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(jp))
    with pytest.raises(ValueError, match="block-aligned"):
        encode_jpeg_gray(7, 8, bytes(56))


def test_jpeg_roundtrip_hypothesis():
    """Property: block-constant exactness holds for ANY byte values and
    grid shape (hypothesis-driven, mirrors the PNG fuzz tier)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bqetl_spark.functions.multimodal import (decode_jpeg,
                                                  encode_jpeg_gray)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 4), st.integers(1, 3),
           st.lists(st.integers(0, 255), min_size=12, max_size=12))
    def run(bw, bh, vals):
        w, h = bw * 8, bh * 8
        gray = bytes(vals[((y // 8) * bw + (x // 8)) % len(vals)]
                     for y in range(h) for x in range(w))
        _, _, rgb = decode_jpeg(encode_jpeg_gray(w, h, gray))
        assert all(rgb[3 * i] == gray[i] for i in range(w * h))

    run()


def test_jpeg_extract_features_matches_ppm(spark):
    """extract_features through the jpeg path equals the PPM path on the
    same gray pixels — decoder-independent statistics."""
    from pyspark.sql import functions as F

    from bqetl_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcdefghijkl"), (2, "ABCDEFGHIJKL")],
        "doc_id long, text string")
    media = mm.attach_jpeg_media(docs, "doc_id", "text", 4, 3)
    jf = {r["media_id"]: r["feature"]
          for r in mm.extract_features(media, fake=False).collect()}
    for mid, text in [(1, "abcdefghijkl"), (2, "ABCDEFGHIJKL")]:
        vals = text.encode()
        n = len(vals)
        assert jf[mid][0] == 32.0 and jf[mid][1] == 24.0
        assert jf[mid][2] == sum(vals) * 64 / 768
        assert jf[mid][5] == 3 * min(vals) / 3.0
        assert jf[mid][6] == 3 * max(vals) / 3.0
        assert jf[mid][7] == sum(vals) * 192 / 2304.0


# ---------------------------------------------------- GIF / LZW (r9) --

def test_gif_decodes_canonical_public_vector():
    """The widely-published 35-byte 1×1 red GIF89a — a REAL third-party
    byte stream, so the decoder is pinned to the actual spec, not to our
    own encoder's dialect."""
    from bqetl_spark.functions.multimodal import decode_gif

    red = bytes.fromhex(
        "47494638396101000100800000ff000000000021f90401000000002c000000"
        "00010001000002024401003b")
    assert decode_gif(red) == (1, 1, b"\xff\x00\x00")


def test_gif_gray_roundtrip_and_palette_mapping():
    from bqetl_spark.functions.multimodal import decode_gif, encode_gif_gray

    vals = bytes(range(24))
    w, h, rgb = decode_gif(encode_gif_gray(6, 4, vals))
    assert (w, h) == (6, 4)
    assert rgb == bytes(v for b in vals for v in (b, b, b))


def test_gif_lzw_code_width_growth_and_table_reset():
    """A 30k-byte pseudo-random stream forces every code-width step
    (9→10→11→12) AND the 4096-entry table-full clear/rebuild; a
    repetitive stream must actually compress."""
    from bqetl_spark.functions.multimodal import decode_gif, encode_gif_gray

    x, vals = 1, bytearray()
    for _ in range(30000):
        x = (x * 1103515245 + 12345) % (1 << 31)
        vals.append((x >> 16) & 0xFF)
    payload = encode_gif_gray(300, 100, bytes(vals))
    w, h, rgb = decode_gif(payload)
    assert (w, h) == (300, 100)
    assert rgb == bytes(v for b in vals for v in (b, b, b))

    rep = b"abcd" * 2500
    small = encode_gif_gray(100, 100, rep)
    assert decode_gif(small)[2] == bytes(v for b in rep for v in (b, b, b))
    assert len(small) < len(rep) // 4  # LZW really compresses


def test_gif_roundtrip_hypothesis():
    """Property: encode_gif_gray→decode_gif is the identity for any
    dims and byte content (hypothesis-driven, like PNG/JPEG)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bqetl_spark.functions.multimodal import decode_gif, encode_gif_gray

    @settings(max_examples=30, deadline=None)
    @given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
    def run(w, h, data):
        vals = bytes(data.draw(st.lists(st.integers(0, 255),
                                        min_size=w * h, max_size=w * h)))
        assert decode_gif(encode_gif_gray(w, h, vals)) == \
            (w, h, bytes(v for b in vals for v in (b, b, b)))

    run()


def test_gif_rejects_corruption_and_unsupported():
    import pytest

    from bqetl_spark.functions.multimodal import decode_gif, encode_gif_gray

    good = bytearray(encode_gif_gray(3, 2, bytes(6)))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + bytes(good[7:]))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(None)
    # flip the image-descriptor interlace bit (descriptor starts right
    # after header 13 + 768-byte palette; packed byte is at +9)
    bad = bytearray(good)
    bad[13 + 768 + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # truncate pixel data: keep structure, drop the data sub-blocks
    with pytest.raises(ValueError):
        decode_gif(bytes(good[:13 + 768 + 10 + 1]) + b"\x00\x3b")
    with pytest.raises(ValueError, match="exactly"):
        encode_gif_gray(4, 4, bytes(3))


def test_gif_extract_features_matches_ppm(spark):
    """The SAME gray pixels through the GIF path and the PPM path must
    give identical integer-exact features (the PNG test's
    codec-independence contract, now for the palette codec)."""
    from bqetl_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwx")], "doc_id bigint, text string")
    gif_media = mm.attach_gif_media(docs, "doc_id", "text", 6, 4)
    gif_feats = mm.extract_features(gif_media, fake=False) \
        .select("media_id", "feature").collect()
    # PPM truecolor with each byte tripled = the gray decode result
    tripled = F.expr(
        "concat_ws('', transform(split(substring(text, 1, 24), ''), "
        "c -> concat(c, c, c)))")
    ppm_payload = F.concat(F.lit("P6\n6 4\n255\n").cast("binary"),
                           tripled.cast("binary"))
    ppm_media = mm.attach_media(docs, "doc_id", ppm_payload,
                                kind="image", fmt="ppm")
    ppm_feats = mm.extract_features(ppm_media, fake=False) \
        .select("media_id", "feature").collect()
    assert gif_feats == ppm_feats


def test_gif_skips_extensions_and_local_palette():
    """A GIF with a graphic-control extension, comment extension, and a
    LOCAL color table must decode the same pixels (third-party GIFs
    carry these even for single frames)."""
    import struct

    from bqetl_spark.functions.multimodal import decode_gif, encode_gif_gray

    base = encode_gif_gray(3, 2, bytes([0, 50, 100, 150, 200, 250]))
    # rebuild by hand: header+LSD WITHOUT global table, extensions, image
    # with local table
    hdr = b"GIF89a" + struct.pack("<HHBBB", 3, 2, 0x00, 0, 0)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    pal = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 2, 0x87)  # local table
    # reuse the compressed stream from the canonical encoder output:
    # it sits after header(13) + global pal(768) + descriptor(10)
    stream = base[13 + 768 + 10:]
    got = decode_gif(hdr + gce + comment + desc + pal + stream)
    want = decode_gif(base)
    assert got == want


def test_qoi_decodes_spec_constructed_vector():
    """A 4×1 RGBA QOI stream hand-assembled FROM THE PUBLISHED SPEC
    (qoiformat.org), one chunk per op class our encoder never emits in
    this order — pins the decoder to the spec, not to our encoder's
    dialect: RGB, RUN(1), DIFF(+1,+1,+1), INDEX back to pixel 0."""
    import struct

    from bqetl_spark.functions.multimodal import decode_qoi

    # hash(10,20,30,255) = (10*3 + 20*5 + 30*7 + 255*11) % 64 = 9
    payload = (b"qoif" + struct.pack(">IIBB", 4, 1, 4, 0)
               + bytes([0xFE, 10, 20, 30])      # QOI_OP_RGB
               + bytes([0xC0])                  # QOI_OP_RUN, len 1
               + bytes([0x7F])                  # QOI_OP_DIFF +1/+1/+1
               + bytes([0x09])                  # QOI_OP_INDEX slot 9
               + b"\x00" * 7 + b"\x01")
    assert decode_qoi(payload) == (
        4, 1, bytes([10, 20, 30, 10, 20, 30, 11, 21, 31, 10, 20, 30]))


def test_qoi_gray_roundtrip_exercises_all_ops():
    """Byte patterns that force RUN (incl. the 62 cap), INDEX reuse,
    wrapping DIFF, LUMA, and the RGB fallback — decode(encode(x)) must
    reproduce x replicated across channels."""
    from bqetl_spark.functions.multimodal import decode_qoi, encode_qoi_gray

    cases = [
        bytes(200),                           # run from the (0,0,0,255) seed
        bytes([65] * 63 + [66] + [65] * 130),  # run-cap boundary + index hit
        bytes(range(250)),                    # +1 deltas -> DIFF chain
        bytes([0, 255] * 50),                 # wrapping -1/+1 deltas
        bytes([10, 200] * 40),                # big jumps -> RGB + INDEX
        b"The quick brown fox jumps over the lazy dog 1234" * 5,
    ]
    for vals in cases:
        w, h, rgb = decode_qoi(encode_qoi_gray(len(vals), 1, vals))
        assert (w, h) == (len(vals), 1)
        assert rgb == bytes(v for b in vals for v in (b, b, b))


def test_qoi_roundtrip_hypothesis():
    """Property: encode_qoi_gray→decode_qoi is the identity for any dims
    and byte content (hypothesis-driven, like PNG/JPEG/GIF)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bqetl_spark.functions.multimodal import decode_qoi, encode_qoi_gray

    @settings(max_examples=30, deadline=None)
    @given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
    def run(w, h, data):
        vals = bytes(data.draw(st.lists(st.integers(0, 255),
                                        min_size=w * h, max_size=w * h)))
        assert decode_qoi(encode_qoi_gray(w, h, vals)) == \
            (w, h, bytes(v for b in vals for v in (b, b, b)))

    run()


def test_qoi_rejects_corruption():
    import pytest

    from bqetl_spark.functions.multimodal import decode_qoi, encode_qoi_gray

    good = encode_qoi_gray(3, 2, bytes(6))
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"qoix" + good[4:])
    with pytest.raises(ValueError, match="channels"):
        decode_qoi(good[:12] + b"\x05" + good[13:])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(good[:15])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(good[:-1] + b"\x02")
    # a RUN that overshoots the declared pixel count is corrupt
    import struct
    bad = (b"qoif" + struct.pack(">IIBB", 2, 1, 3, 0)
           + bytes([0xFE, 1, 1, 1, 0xC0 | 5]) + b"\x00" * 7 + b"\x01")
    with pytest.raises(ValueError, match="overflows"):
        decode_qoi(bad)


def test_qoi_extract_features_matches_ppm(spark):
    """extract_features over QOI media must equal the PPM path on the
    same pixels — certifies the whole attach→decode→featurize chain
    against the simplest codec (the GIF-gate cross-check discipline)."""
    from pyspark.sql import functions as F

    from bqetl_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789ABCD"),
         (2, "The quick brown fox jumps over a lazy do")],
        ["doc_id", "text"])
    qoi_media = mm.attach_qoi_media(docs, "doc_id", "text", 8, 5)
    qoi_feats = mm.extract_features(qoi_media, fake=False) \
        .select("media_id", "feature").collect()
    tripled = F.expr(
        "concat('P6 8 5 255\\n', "
        "array_join(transform(split(substring(text, 1, 40), ''), "
        "c -> concat(c, c, c)), ''))")
    ppm_media = mm.attach_media(docs, "doc_id", tripled.cast("binary"),
                                kind="image", fmt="ppm")
    ppm_feats = mm.extract_features(ppm_media, fake=False) \
        .select("media_id", "feature").collect()
    assert sorted(qoi_feats) == sorted(ppm_feats)


def test_mulaw_quantizer_properties():
    """The G.711 companding invariants: byte-roundtrip identity
    (encode(decode(b)) == b for every byte), quantization error
    bounded by the segment step, sign symmetry, and the clip."""
    from bqetl_spark.functions.multimodal import mulaw_byte, mulaw_sample

    for b in range(256):
        if b == 0x7F:
            # the classic mu-law quirk: 0x7F is NEGATIVE zero — it
            # decodes to 0, which re-encodes as positive zero 0xFF
            assert mulaw_sample(b) == 0 and mulaw_byte(0) == 0xFF
            continue
        assert mulaw_byte(mulaw_sample(b)) == b
    # quantizer idempotence holds for every byte, negative zero included
    for b in range(256):
        q = mulaw_sample(b)
        assert mulaw_sample(mulaw_byte(q)) == q
    for x in [0, 1, 50, 131, 132, 1000, 8191, 32635, 32767, -32768,
              -1000, -7]:
        q = mulaw_sample(mulaw_byte(x))
        clipped = max(min(x, 32635), -32635)
        # error <= half the segment step (step = 2^(e+3) <= 1024)
        assert abs(q - clipped) <= 1024, (x, q)
        assert (q < 0) == (clipped < 0) or q == 0
    assert mulaw_sample(mulaw_byte(-1000)) == -mulaw_sample(mulaw_byte(1000))
    assert mulaw_sample(mulaw_byte(32767)) == mulaw_sample(mulaw_byte(32635))


def test_mulaw_known_vectors():
    """Spot values computed by hand from the spec arithmetic: x=1000 ->
    a=1132, e=3, m=1 -> q=988; x=0 -> a=132, e=0, m=0 -> q=0."""
    from bqetl_spark.functions.multimodal import mulaw_byte, mulaw_sample

    assert mulaw_sample(mulaw_byte(1000)) == 988
    assert mulaw_sample(mulaw_byte(0)) == 0
    assert mulaw_sample(mulaw_byte(-988)) == -988  # quantizer fixpoint


def test_transcode_wav_mulaw_quantizes_samples(spark):
    """End-to-end: WAV -> mu-law -> WAV; decoded samples must equal the
    pure-Python quantizer applied to the originals, including negative
    samples (the path the ASCII gate corpus cannot reach)."""
    import struct

    from pyspark.sql import functions as F

    from bqetl_spark.functions import multimodal as mm
    from bqetl_spark.functions.multimodal import (decode_wav, mulaw_byte,
                                                  mulaw_sample)

    samples = [0, 1, -1, 1000, -1000, 32767, -32768, 12345, -23456, 7]
    data = struct.pack(f"<{len(samples)}h", *samples)
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
           + b"data" + len(data).to_bytes(4, "little"))
    df = spark.createDataFrame([(1, bytearray(hdr + data))],
                               ["doc_id", "payload"])
    media = mm.attach_media(df, "doc_id", F.col("payload"),
                            kind="audio", fmt="wav")
    out = mm.transcode_wav_mulaw(media).collect()[0]["payload"]
    n_ch, rate, got = decode_wav(bytes(out))
    assert (n_ch, rate) == (1, 8000)
    assert got == [mulaw_sample(mulaw_byte(x)) for x in samples]


def test_tiff_roundtrip_all_strip_layouts():
    import random

    from bqetl_spark.functions.multimodal import (decode_tiff,
                                                  encode_tiff_gray)

    random.seed(3)
    for w, h, rps in [(6, 4, None), (8, 5, 2), (3, 7, 1), (10, 1, None),
                      (1, 9, 4)]:
        vals = bytes(random.randrange(256) for _ in range(w * h))
        got = decode_tiff(encode_tiff_gray(w, h, vals,
                                           rows_per_strip=rps))
        assert got == (w, h, bytes(v for g in vals for v in (g, g, g)))


def test_tiff_big_endian_and_inline_value_justification():
    """A hand-assembled MM (big-endian) fixture: per the TIFF spec an
    inline SHORT value is LEFT-justified in the 4 value bytes — the
    detail that silently corrupts naive readers. Built independently
    of the encoder (which always writes II)."""
    import struct

    from bqetl_spark.functions.multimodal import decode_tiff

    def entry_long(tag, cnt, val):
        return struct.pack(">HHII", tag, 4, cnt, val)

    def entry_short(tag, cnt, val):
        return struct.pack(">HHIHH", tag, 3, cnt, val, 0)

    ifd = struct.pack(">H", 9)
    ifd += entry_long(256, 1, 2) + entry_long(257, 1, 1)
    ifd += entry_short(258, 1, 8) + entry_short(259, 1, 1)
    ifd += entry_short(262, 1, 1)
    ifd += entry_long(273, 1, 8 + 2 + 12 * 9 + 4)
    ifd += entry_short(277, 1, 1)
    ifd += entry_long(278, 1, 1) + entry_long(279, 1, 2)
    mm = (b"MM" + struct.pack(">HI", 42, 8) + ifd
          + struct.pack(">I", 0) + bytes([7, 200]))
    assert decode_tiff(mm) == (2, 1, bytes([7, 7, 7, 200, 200, 200]))


def test_tiff_white_is_zero_inverts():
    import struct

    from bqetl_spark.functions.multimodal import (decode_tiff,
                                                  encode_tiff_gray)

    s = encode_tiff_gray(2, 1, bytes([0, 255]))
    i = s.index(struct.pack("<HHII", 262, 3, 1, 1))
    s = s[:i] + struct.pack("<HHII", 262, 3, 1, 0) + s[i + 12:]
    assert decode_tiff(s) == (2, 1, bytes([255] * 3 + [0] * 3))


def test_tiff_rejects_corruption_and_unsupported():
    import struct

    import pytest

    from bqetl_spark.functions.multimodal import (decode_tiff,
                                                  encode_tiff_gray)

    good = encode_tiff_gray(3, 2, bytes(6))
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II" + struct.pack("<HI", 41, 8) + good[8:])
    with pytest.raises(ValueError, match="truncated TIFF strips"):
        decode_tiff(good[:-3])
    i = good.index(struct.pack("<HHII", 259, 3, 1, 1))
    lzw = good[:i] + struct.pack("<HHII", 259, 3, 1, 5) + good[i + 12:]
    with pytest.raises(ValueError, match="uncompressed"):
        decode_tiff(lzw)


def test_tiff_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bqetl_spark.functions.multimodal import (decode_tiff,
                                                  encode_tiff_gray)

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 10), h=st.integers(1, 10),
           rps=st.integers(1, 11), data=st.data())
    def run(w, h, rps, data):
        vals = bytes(data.draw(st.lists(st.integers(0, 255),
                                        min_size=w * h, max_size=w * h)))
        got = decode_tiff(encode_tiff_gray(w, h, vals,
                                           rows_per_strip=min(rps, h)))
        assert got == (w, h, bytes(v for g in vals for v in (g, g, g)))

    run()


# pHash perceptual near-dup (r11) ---------------------------------------------

_PH_BASE = "The quick brown fox jumps over the lazy dog near the river bank."


def _ph_docs(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return mm.attach_tiff_media(df, "doc_id", "text", 8, 8, rows_per_strip=2)


def test_image_phash_matches_numpy_replay(spark):
    """The Spark hash (decode → pooled luma → fixed-point DCT → median
    sign bits) equals an independent numpy replay computed straight from
    the text bytes — the same identity the DuckDB oracle relies on."""
    import numpy as np

    texts = [_PH_BASE, _PH_BASE[::-1], "z" * 64]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {r["media_id"]: r["phash"]
           for r in mm.image_phash(_ph_docs(spark, rows)).collect()}

    C = np.asarray(mm.phash_dct_table(15), dtype=np.int64)
    for i, t in enumerate(texts):
        P = (3 * np.frombuffer(t.encode(), dtype=np.uint8)
             .astype(np.int64)).reshape(8, 8)
        ac = (C @ P @ C.T).reshape(64)[1:]
        m = np.sort(ac)[31]
        bits = (ac > m).astype(np.uint64)
        want = int((bits * (np.uint64(1)
                            << np.arange(63, dtype=np.uint64)))
                   .sum(dtype=np.uint64))
        assert got[i] == want


def test_phash_neardup_finds_perturbed_pair(spark):
    """Known-near-dup pin: a +16 single-byte perturbation (a visibly
    different but perceptually similar image) must pair with the original
    at small positive hamming; an unrelated image must NOT pair with
    either. Exact duplicates pin at hamming 0."""
    near = _PH_BASE[:14] + chr(ord(_PH_BASE[14]) + 16) + _PH_BASE[15:]
    rows = [(1, _PH_BASE), (2, near), (3, "#" * 32 + "@" * 32),
            (4, _PH_BASE)]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in mm.phash_neardup(_ph_docs(spark, rows)).collect()}
    assert pairs[(1, 4)] == 0                      # exact dup
    assert 0 < pairs[(1, 2)] <= 8                  # perceptual near-dup
    assert pairs[(1, 2)] == pairs[(2, 4)]
    assert not any(3 in p for p in pairs)          # unrelated stays out


def test_phash_neardup_bucket_cap_drops_boilerplate(spark):
    """The max_bucket_size guard: a constant-image shingle shared by more
    docs than the cap produces NO pairs (the quadratic bucket is dropped
    deterministically), while a small cluster below the cap still pairs."""
    rows = [(i, "x" * 64) for i in range(10)] + \
           [(100, _PH_BASE), (101, _PH_BASE)]
    out = mm.phash_neardup(_ph_docs(spark, rows), max_bucket_size=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == {(100, 101)}


# phash_clusters + audio fingerprint near-dup (r11 second half) --------------


def test_phash_clusters_groups_transitively(spark):
    """a~b and b~c (near) must cluster {a,b,c} together even if a~c
    exceeds the pair threshold — the transitive-closure semantics that
    make clusters curation-usable; representative = min id."""
    near1 = _PH_BASE[:14] + chr(ord(_PH_BASE[14]) + 16) + _PH_BASE[15:]
    rows = [(1, _PH_BASE), (2, near1), (3, _PH_BASE), (9, "#" * 64)]
    out = {r["media_id"]: r for r in
           mm.phash_clusters(_ph_docs(spark, rows)).collect()}
    from bqetl_spark.caching import release_pinned
    release_pinned()
    assert set(out) == {1, 2, 3}            # the unrelated image absent
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert out[1]["is_representative"] and not out[2]["is_representative"]
    assert out[1]["cluster_size"] == 3


def _mono_wav(samples):
    import struct
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            + b"data" + len(data).to_bytes(4, "little") + data)


def _audio_media(spark, rows):
    df = spark.createDataFrame(
        [(i, bytearray(_mono_wav(s))) for i, s in rows], ["doc_id", "payload"])
    return mm.attach_media(df, "doc_id", F.col("payload"), kind="audio",
                           fmt="wav")


def test_audio_fingerprint_energy_delta_bits(spark):
    """Hand-computable vector: energies strictly rising → all bits set;
    strictly falling → zero; and the fingerprint survives uniform gain
    (×2 all samples) — the perceptual property."""
    rising = [1, -2, 3, -4, 5]            # |s| rises -> energy rises
    falling = [5, -4, 3, -2, 1]
    out = {r["media_id"]: r for r in mm.audio_fingerprint(
        _audio_media(spark, [(1, rising), (2, falling),
                             (3, [2 * s for s in rising])]),
        frame=1).collect()}
    assert out[1]["afp"] == 0b1111 and out[1]["n_frames"] == 5
    assert out[2]["afp"] == 0
    assert out[3]["afp"] == out[1]["afp"]   # gain-invariant


def test_audio_neardup_pairs_and_guard(spark):
    """A one-sample perturbation flips at most a couple of delta bits →
    pairs at small hamming; an unrelated signal stays out; a constant
    tone shared by many docs is dropped by the bucket cap."""
    import random
    rng = random.Random(5)
    base = [rng.randrange(-3000, 3000) for _ in range(33)]
    near = list(base)
    near[10] += 40                          # tiny edit
    other = [rng.randrange(-3000, 3000) for _ in range(33)]
    rows = [(1, base), (2, near), (3, other), (4, base)]
    rows += [(100 + i, [500] * 33) for i in range(8)]   # constant tone
    out = mm.audio_neardup(_audio_media(spark, rows), frame=1, n_bits=32,
                           max_hamming=3, bands=4, max_bucket_size=5)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    from bqetl_spark.caching import release_pinned
    release_pinned()
    assert pairs[(1, 4)] == 0
    assert pairs.get((1, 2), 99) <= 3
    assert not any(3 in p for p in pairs)
    assert not any(a >= 100 or b >= 100 for a, b in pairs)  # cap drops tone


# --- video near-dup (r12: the last per-modality dedup cell) -----------

def _vid_meta(df):
    return df.select(
        "media_id", "payload",
        F.struct(F.lit("video").alias("kind"),
                 F.lit("ppms").alias("format"),
                 F.lit(None).cast("long").alias("width"),
                 F.lit(None).cast("long").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms"))
        .alias("meta"))


def _frame_px(seed: int) -> bytes:
    """Deterministic pseudorandom 8x8 RGB frame (md5-expanded) — enough
    bit spread that distinct seeds give far-apart pHashes."""
    import hashlib

    out = b""
    i = 0
    while len(out) < 192:
        out += hashlib.md5(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:192]


def test_video_neardup_perturbations(spark):
    """The gate's robustness claims, pinned: a re-encoded copy (header
    comments/whitespace changed, same pixels) pairs at hamming 0 on all
    frames; a truncated copy pairs on its surviving frames; unrelated
    clips never pair."""
    from bqetl_spark.caching import release_pinned

    frames = [_frame_px(s) for s in (1, 2, 3, 4)]
    base = b"".join(_ppm(8, 8, p) for p in frames)
    reenc = b"".join(b"P6\n# re-encoded\n8  8\n255\n" + p for p in frames)
    trunc = b"".join(_ppm(8, 8, p) for p in frames[:2])
    other = b"".join(_ppm(8, 8, _frame_px(s)) for s in (7, 8, 9, 10))
    df = spark.createDataFrame(
        [(1, base), (2, reenc), (3, trunc), (4, other)],
        "media_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r for r in
             mm.video_neardup(_vid_meta(df), min_frame_matches=2)
             .collect()}
    release_pinned()
    assert pairs[(1, 2)]["n_frame_matches"] == 4     # all frames, exact
    assert pairs[(1, 2)]["min_hamming"] == 0
    assert pairs[(1, 3)]["n_frame_matches"] == 2     # surviving frames
    assert pairs[(2, 3)]["n_frame_matches"] == 2
    assert all(4 not in p for p in pairs), pairs     # unrelated never


def test_video_frame_phash_matches_image_phash(spark):
    """A 1-frame ppms video's frame hash must equal image_phash of the
    identical frame shipped as a plain ppm image — one DCT recipe."""
    from bqetl_spark.caching import release_pinned

    px = _frame_px(42)
    vid = _vid_meta(spark.createDataFrame([(9, _ppm(8, 8, px))],
                                          "media_id long, payload binary"))
    img = mm.attach_media(
        spark.createDataFrame([(9, "x")], "doc_id long, text string"),
        "doc_id", F.lit(_ppm(8, 8, px)), kind="image", fmt="ppm")
    vh = mm.video_frame_phash(vid).collect()
    ih = mm.image_phash(img).collect()
    release_pinned()
    assert len(vh) == 1 and vh[0]["frame_idx"] == 0
    assert vh[0]["phash"] == ih[0]["phash"]


def test_video_neardup_validates(spark):
    df = _vid_meta(spark.createDataFrame([(1, _ppm(8, 8, _frame_px(1)))],
                                         "media_id long, payload binary"))
    with pytest.raises(ValueError):
        mm.video_neardup(df, max_hamming=9)
    with pytest.raises(ValueError):
        mm.video_neardup(df, min_frame_matches=0)


def test_phash_lookup_probe_never_dropped_by_cap(spark):
    """The asymmetric lookup's cap counts INDEX rows only: with a
    boilerplate bucket capped out of the index, a probe identical to a
    NON-boilerplate index row still finds it; and every probe finds its
    exact copy in the index at hamming 0 when uncapped."""
    from bqetl_spark.caching import release_pinned

    vids = [(i, _ppm(8, 8, _frame_px(1 if i < 60 else i)))
            for i in range(64)]  # 60 identical-frame clips = boilerplate
    media = _vid_meta(spark.createDataFrame(
        vids, "media_id long, payload binary"))
    index = mm.video_frame_phash(media)
    img = mm.attach_media(
        spark.createDataFrame([(63, "x")], "doc_id long, text string"),
        "doc_id", F.lit(_ppm(8, 8, _frame_px(63))), kind="image",
        fmt="ppm")
    probes = (mm.image_phash(img)
              .select(F.col("media_id").alias("probe_id"), "phash"))
    hits = mm.phash_lookup(probes, index, max_hamming=0,
                           max_bucket_size=8).collect()
    release_pinned()
    # the 60-clip boilerplate bucket is capped away, but the probe's own
    # unique frame survives the index side and self-matches at hamming 0
    assert {(r["probe_id"], r["media_id"], r["hamming"])
            for r in hits} == {(63, 63, 0)}
    with pytest.raises(ValueError):
        mm.phash_lookup(probes, index, max_hamming=9)


# dihedral-invariant pHash (r12) ----------------------------------------------


def test_phash_dihedral_variant_algebra_matches_bruteforce():
    """The one-DCT orbit derivation (transpose + sign flips on the
    spectrum) equals brute-force DCT of each transformed pixel plane —
    the integer identity both the Spark UDF and the SQL oracle rely on,
    which holds only because phash_dct_table_sym truncates toward zero
    (C[u][7-x] == (-1)^u · C[u][x] exactly)."""
    import numpy as np

    C = np.asarray(mm.phash_dct_table_sym(15), dtype=np.int64)
    for u in range(8):
        for x in range(8):
            assert C[u][7 - x] == (-1) ** u * C[u][x]

    rng = np.random.default_rng(7)
    P = rng.integers(0, 766, size=(5, 8, 8)).astype(np.int64)

    def dct(p):
        return np.einsum("uy,nyx,vx->nuv", C, p, C)

    pixel_transforms = {
        0: lambda p: p,
        1: lambda p: np.rot90(p, 1, axes=(1, 2)),
        2: lambda p: np.rot90(p, 2, axes=(1, 2)),
        3: lambda p: np.rot90(p, 3, axes=(1, 2)),
        4: lambda p: p[:, :, ::-1],
        5: lambda p: p[:, ::-1, :],
        6: lambda p: p.transpose(0, 2, 1),
        7: lambda p: p[:, ::-1, ::-1].transpose(0, 2, 1),
    }
    base = dct(P)
    swapped = base.transpose(0, 2, 1)
    uu = np.arange(8).reshape(8, 1)
    vv = np.arange(8).reshape(1, 8)
    for t, sw, a, b in mm.PHASH_DIHEDRAL_VARIANTS:
        want = dct(pixel_transforms[t](P))
        sgn = np.where((a * uu + b * vv) % 2 == 1, -1, 1)
        got = (swapped if sw else base) * sgn[None, :, :]
        assert np.array_equal(want, got), f"variant {t} diverges"


def test_phash_dihedral_invariance_through_real_codec(spark):
    """All 8 dihedral transforms of a 16x16 image (applied at the PIXEL
    level before TIFF encoding, so pooling-commutation is exercised, not
    just the 8x8 identity case) hash to the SAME canonical value through
    the real encode->decode->pool->DCT path; an unrelated image differs;
    and the canonical hash is invariant under which orbit member is the
    'original'."""
    import numpy as np

    from bqetl_spark.functions.multimodal import encode_tiff_gray

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    other = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    transforms = [
        lambda p: p, lambda p: np.rot90(p, 1), lambda p: np.rot90(p, 2),
        lambda p: np.rot90(p, 3), lambda p: p[:, ::-1], lambda p: p[::-1, :],
        lambda p: p.T, lambda p: p[::-1, ::-1].T,
    ]
    rows = [(i, encode_tiff_gray(16, 16, bytes(tf(base).ravel())))
            for i, tf in enumerate(transforms)]
    rows.append((99, encode_tiff_gray(16, 16, bytes(other.ravel()))))
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    media = mm.attach_media(df, "media_id", F.col("payload"),
                            kind="image", fmt="tiff")
    got = {r["media_id"]: r["phash"]
           for r in mm.image_phash_dihedral(media).collect()}
    orbit = {got[i] for i in range(8)}
    assert len(orbit) == 1, f"orbit not collapsed: {orbit}"
    assert got[99] not in orbit
    assert all(h >= 0 for h in got.values())  # 63-bit pack, sign-free min


# Shazam-style landmark index + offset-vote lookup (r12) ----------------------


def _lm_media(spark, rows):
    """rows: (media_id, [samples]) -> WAV media table."""
    df = spark.createDataFrame(
        [(i, _wav(1, 8000, s)) for i, s in rows], ["media_id", "payload"])
    return mm.attach_media(df, "media_id", F.col("payload"),
                           kind="audio", fmt="wav")


def _lm_track(seed, nf=16):
    """A deterministic 'melody': nf frames of 8 samples with per-frame
    amplitude and dominant-bin structure varied so interior energy peaks
    exist. Pure integers, positive (the ASCII-sample regime)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for f in range(nf):
        amp = int(rng.integers(50, 4000))
        base = rng.integers(10, 120, size=8)
        out.extend(int(v) for v in base * amp // 100)
    return out


def test_audio_landmarks_shift_and_gain_invariance(spark):
    """A snippet cut at a whole-frame offset reproduces the track's
    interior landmarks shifted by exactly that many frames; doubling
    every sample (uniform gain) leaves the landmark set bit-identical."""
    s = _lm_track(3, nf=16)
    rows = [(0, s), (1, s[16:]), (2, [v * 2 for v in s])]
    got = {}
    for r in mm.audio_landmarks(_lm_media(spark, rows)).collect():
        got.setdefault(r["media_id"], set()).add((r["f1"], r["lhash"]))
    # gain invariance: exact same landmark set
    assert got[2] == got[0]
    # shift covariance: snippet landmarks (whose pairs lie wholly inside
    # the shifted window) appear in the track at f1 + 2
    shifted = {(f1 + 2, h) for f1, h in got[1]}
    assert shifted <= got[0]
    assert len(shifted) >= 3


def test_audio_lookup_offset_votes_and_hot_hash_guard(spark):
    """The probe matches its own track at the true frame offset; an
    unrelated track never wins; and a landmark hash occurring more often
    than max_hash_freq is dropped from the INDEX side (probes are never
    dropped — lookup still succeeds on the remaining hashes)."""
    s = _lm_track(7, nf=20)
    tracks = [(10, s), (11, _lm_track(8, nf=20)), (12, _lm_track(9, nf=20))]
    idx = mm.audio_landmarks(_lm_media(spark, tracks))
    probe = (mm.audio_landmarks(_lm_media(spark, [(10, s[32:])]))
             .select(F.col("media_id").alias("probe_id"), "f1", "lhash"))
    best = mm.audio_lookup(probe, idx, min_votes=3).collect()
    assert len(best) == 1
    r = best[0]
    assert (r["probe_id"], r["track_id"], r["foffset"]) == (10, 10, 4)
    assert r["votes"] >= 3

    # guard: with max_hash_freq=0 every index hash is dropped -> no match
    assert mm.audio_lookup(probe, idx, min_votes=1,
                           max_hash_freq=0).collect() == []


def test_video_dihedral_mirror_and_reverse_match(spark):
    """Mirrored and temporally-REVERSED copies of a clip pair at full
    frame count through the orbit-canonical hash (plain frame pHash
    misses both: a flip toggles ~half the sign bits, reversal misaligns
    indices — but the canon is per-frame invariant and the pair query
    aggregates order away); an unrelated clip never pairs."""
    import numpy as np

    rng = np.random.default_rng(5)

    def clip(frames):
        return b"".join(b"P6\n8 8\n255\n" + f for f in frames)

    def mirror(f):
        a = np.frombuffer(f, dtype=np.uint8).reshape(8, 8, 3)
        return bytes(a[:, ::-1, :].tobytes())

    frames = [bytes(rng.integers(0, 256, size=192, dtype=np.uint8))
              for _ in range(3)]
    other = [bytes(rng.integers(0, 256, size=192, dtype=np.uint8))
             for _ in range(3)]
    rows = [(1, clip(frames)),
            (2, clip([mirror(f) for f in frames])),   # mirrored copy
            (3, clip(frames[::-1])),                  # reversed copy
            (4, clip(other))]                         # unrelated
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    media = mm.attach_media(df, "media_id", F.col("payload"),
                            kind="video", fmt="ppms")
    fh = mm.video_frame_phash_dihedral(media)
    got = {(r["id_a"], r["id_b"]): r["n_frame_matches"]
           for r in mm.video_dihedral_pairs(fh).collect()}
    assert got[(1, 2)] == 3 and got[(1, 3)] == 3 and got[(2, 3)] == 3
    assert not any(4 in p for p in got)
    # plain (non-canonical) frame hashes DO diverge under the mirror —
    # the invariance is the dihedral canon's doing, not a coincidence
    plain = {r["media_id"]: r["phash"] for r in
             mm.video_frame_phash(media).filter("frame_idx = 0").collect()}
    assert plain[1] != plain[2]

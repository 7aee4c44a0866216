"""Multimodal plumbing tests: schema, determinism, metadata-first filtering,
and executor-side frame explosion (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from trough_spark.operators import multimodal as M
from trough_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def media(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return M.synthesize_media(docs, "doc_id", "text").cache()


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,modality:string,content:binary,"
        "meta:struct<width:int,height:int,sample_rate:int,duration_ms:int,format:string>>"
    )


def test_image_decode_deterministic(media):
    feats1 = {r["media_id"]: r for r in M.decode_image_features(media).collect()}
    feats2 = {r["media_id"]: r for r in M.decode_image_features(media).collect()}
    assert feats1 == feats2
    assert len(feats1) == 50
    any_row = next(iter(feats1.values()))
    assert any_row["n_bytes"] == 16  # md5 digest payload
    assert 0.0 <= any_row["mean_byte"] <= 255.0


def test_metadata_filter_prunes_before_decode(media):
    # filter on metadata BEFORE decode — the plan must not decode everything
    small = media.filter("meta.width >= 40")
    n_small = small.count()
    feats = M.decode_image_features(small).collect()
    assert len(feats) == n_small
    assert all(r["width"] >= 40 for r in feats)


def test_audio_features(media):
    rows = M.decode_audio_features(media).collect()
    assert len(rows) == 50
    assert all(r["sample_rate"] == 16000 and r["rms"] > 0 for r in rows)


def test_frame_sampling_explodes_in_executor(media):
    frames = M.sample_frames(media, every_n=2, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(idx == [0, 2, 4] for idx in by_id.values())
    assert all(len(r["frame_bytes"]) > 0 for r in frames)


def test_custom_codec_ships_to_executors(media):
    """The codec hook is a closure-captured callable, so a user-supplied
    decoder must actually run on the workers (not fall back to the fake)."""
    import numpy as np

    def raw_codec(blob):
        return np.frombuffer(blob, dtype=np.uint8)

    feats = {r["media_id"]: r for r in M.decode_image_features(media, codec=raw_codec).collect()}
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, row in feats.items():
        expect = float(round(np.frombuffer(raw[mid], dtype=np.uint8).astype(np.float64).mean(), 6))
        assert row["mean_byte"] == expect
    # and the default fake gives a DIFFERENT answer (digest-prefixed payload)
    fake = {r["media_id"]: r for r in M.decode_image_features(media).collect()}
    assert any(fake[m]["mean_byte"] != feats[m]["mean_byte"] for m in feats)


def _have(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def _encode_png(px, color_type, filter_type=0):
    """Minimal stdlib PNG encoder (test fixture builder): 8-bit,
    non-interlaced, one filter type for every scanline — real PNG bytes any
    conforming decoder must accept."""
    import struct
    import zlib

    h, w = px.shape[0], px.shape[1]
    channels = 1 if px.ndim == 2 else px.shape[2]
    stride = w * channels
    flat = bytes(px.reshape(h, stride).astype("uint8").tobytes())
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = flat[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - channels] if i >= channels else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:  # Paeth
            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

            raw += bytes(
                (
                    row[i]
                    - paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples16, rate=16000):
    """Stdlib 16-bit PCM WAV encoder (test fixture builder)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples16.astype("<i2").tobytes())
    return buf.getvalue()


def test_png_codec_real_decode(spark):
    """Real-codec path, always on: a genuinely encoded PNG decoded through
    the Spark pipeline with the stdlib codec yields the true pixel mean.
    Cross-checked against Pillow when it is installed."""
    import numpy as np

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = _encode_png(px, color_type=2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(blob), (4, 4, 0, 0, "png"))],
        M.MEDIA_SCHEMA,
    )
    row = M.decode_image_features(df, codec=M.png_image_codec).collect()[0]
    assert row["mean_byte"] == float(round(px.astype(np.float64).mean(), 6))
    if _have("PIL"):
        pil_row = M.decode_image_features(df, codec=M.pil_image_codec).collect()[0]
        assert pil_row["mean_byte"] == row["mean_byte"]


def test_png_codec_filters_and_color_types():
    """The stdlib decoder round-trips every scanline filter (0-4) and every
    supported color type against real encoded bytes."""
    import numpy as np

    rng = np.random.RandomState(7)
    shapes = {0: (6, 5), 2: (6, 5, 3), 4: (6, 5, 2), 6: (6, 5, 4)}
    for color_type, shape in shapes.items():
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for filt in range(5):
            got = M.png_image_codec(_encode_png(px, color_type, filt))
            assert np.array_equal(got, px.reshape(-1)), (color_type, filt)
    if _have("PIL"):
        import io

        from PIL import Image

        px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
        for filt in range(5):
            img = Image.open(io.BytesIO(_encode_png(px, 2, filt)))
            assert np.array_equal(np.asarray(img).reshape(-1), px.reshape(-1))


def test_wav_codec_real_decode(spark):
    """Real-codec audio path, always on: stdlib-encoded 16-bit PCM WAV
    decoded through the Spark pipeline gives the signal's true RMS.
    Cross-checked against soundfile when it is installed."""
    import numpy as np

    samples = np.sin(np.linspace(0, 2 * np.pi, 1600))
    blob = _encode_wav(np.round(samples * 32767.0))
    df = spark.createDataFrame(
        [(1, "audio", bytearray(blob), (0, 0, 16000, 100, "wav"))],
        M.MEDIA_SCHEMA,
    )
    row = M.decode_audio_features(df, codec=M.wav_audio_codec).collect()[0]
    expect = float(np.sqrt((samples**2).mean()))
    assert abs(row["rms"] - expect) < 1e-3  # WAV is 16-bit quantized
    if _have("soundfile"):
        sf_row = M.decode_audio_features(df, codec=M.soundfile_audio_codec).collect()[0]
        assert abs(sf_row["rms"] - row["rms"]) < 1e-6


def test_missing_codec_lib_fails_loudly():
    if _have("PIL"):
        pytest.skip("Pillow installed; the loud-failure path needs it absent")
    with pytest.raises(NotImplementedError):
        M.pil_image_codec(b"\x89PNG\r\n")


def test_resize_images_deterministic_shape(media):
    out = {r["media_id"]: r for r in M.resize_images(media, 8, 8).collect()}
    assert len(out) == 50
    for r in out.values():
        assert r["n_bytes"] == 64 and len(r["resized"]) == 64
        assert 0.0 <= r["mean_byte"] <= 255.0
    again = {r["media_id"]: r for r in M.resize_images(media, 8, 8).collect()}
    assert out == again


def test_resize_images_nearest_neighbor_exact(spark):
    """Pin the sampling rule: resized[i] == pixels[floor(i*n/t)]."""
    import numpy as np

    blob = bytes(range(100))
    df = spark.createDataFrame(
        [(1, "image", bytearray(blob), (10, 10, 0, 0, "raw"))], M.MEDIA_SCHEMA
    )
    raw_codec = lambda b: np.frombuffer(b, dtype=np.uint8)  # noqa: E731
    row = M.resize_images(df, 4, 4, codec=raw_codec).collect()[0]
    expect = bytes([(i * 100) // 16 for i in range(16)])
    assert bytes(row["resized"]) == expect


def test_phash_bits_follow_pixels_above_mean(spark):
    def identity_codec(blob):
        import numpy as np

        return np.frombuffer(blob, dtype=np.uint8)

    # 8 pixels, chunk of high values at the end: bits 4..7 set (p*8 > sum)
    blob = bytes([0, 0, 0, 0, 200, 200, 200, 200])
    df = spark.createDataFrame([(1, blob)], "media_id long, content binary")
    row = M.perceptual_hash(df, bits=8, codec=identity_codec).collect()[0]
    assert row.n_pixels == 8
    assert row.phash == 0b11110000


def test_phash_pairs_full_recall_vs_bruteforce(spark):
    def identity_codec(blob):
        import numpy as np

        return np.frombuffer(blob, dtype=np.uint8)

    # 6 images: 1/2 identical, 3 one-pixel flip of 1 (hamming 1),
    # 4 a different pattern, 5/6 identical to each other
    base = bytes([10] * 16 + [250] * 16)
    near = bytes([10] * 15 + [250] * 17)
    other = bytes([250, 10] * 16)
    rows = [(1, base), (2, base), (3, near), (4, other), (5, other[::-1]), (6, other[::-1])]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = M.perceptual_hash(df, bits=32, codec=identity_codec)
    got = {
        (r.id1, r.id2): r.hamming
        for r in M.phash_hamming_pairs(hashes, bits=32, bands=4, max_hamming=3).collect()
    }

    # brute force over the collected hashes (6 rows — test-only)
    hs = {r.media_id: r.phash for r in hashes.collect()}
    want = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert got == want
    assert got[(1, 2)] == 0  # identical images found
    assert (1, 3) in got  # one-pixel flip found via pigeonhole banding


def test_phash_pairs_rejects_uneven_bands():
    with pytest.raises(ValueError):
        M.phash_hamming_pairs(None, bits=32, bands=5)

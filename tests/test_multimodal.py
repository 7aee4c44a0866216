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


@pytest.mark.skipif(not _have("PIL"), reason="Pillow not installed")
def test_pil_codec_real_decode(spark):
    """Real-codec path: encode a tiny PNG with Pillow, decode through the
    Spark pipeline, and check the pixel mean is the true pixel mean."""
    import io

    import numpy as np
    from PIL import Image

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="PNG")
    blob = buf.getvalue()
    df = spark.createDataFrame(
        [(1, "image", bytearray(blob), (4, 4, 0, 0, "png"))],
        M.MEDIA_SCHEMA,
    )
    row = M.decode_image_features(df, codec=M.pil_image_codec).collect()[0]
    assert row["mean_byte"] == float(round(px.astype(np.float64).mean(), 6))


@pytest.mark.skipif(not _have("soundfile"), reason="soundfile not installed")
def test_soundfile_codec_real_decode(spark):
    import io

    import numpy as np
    import soundfile as sf

    samples = np.sin(np.linspace(0, 2 * np.pi, 1600)).astype(np.float64)
    buf = io.BytesIO()
    sf.write(buf, samples, 16000, format="WAV")
    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()), (0, 0, 16000, 100, "wav"))],
        M.MEDIA_SCHEMA,
    )
    row = M.decode_audio_features(df, codec=M.soundfile_audio_codec).collect()[0]
    expect = float(round(float(np.sqrt((samples**2).mean())), 6))
    assert abs(row["rms"] - expect) < 1e-3  # WAV is 16-bit quantized


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

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


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        M._decode_bytes(b"xx", real_codec=True)

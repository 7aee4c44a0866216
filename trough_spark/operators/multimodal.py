"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is the real deliverable here — schema, partitioning,
UDF signatures, and batch shapes are production-shaped and tested.  The
actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the decode
kernels are deterministic fakes behind ``_decode_bytes``; swap that one
function for a real decoder and everything else stands.  Attempting to use
a real codec raises NotImplementedError with a clear message.

Scale design:
- binary payloads stay in Arrow buffers end-to-end (no Python-object copies
  of the blob except inside the kernel);
- each ``mapInPandas`` batch is one vectorized kernel invocation —
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory;
- metadata is a real struct column so filters on it (e.g. width >= 64)
  prune BEFORE decode — always filter on metadata first, decode last;
- kernels are stateless per-batch: safe under speculative execution and
  task retry.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, modality string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, format:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes int, mean_byte double, fingerprint string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, duration_ms int, n_bytes int, rms double"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_index int, frame_bytes binary"


def synthesize_media(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Deterministic fake media: content = md5-keyed bytes of the text, with
    plausible metadata.  Stands in for reading real blobs from object
    storage; everything downstream treats content as opaque."""
    content = F.to_binary(F.md5(F.col(text_col)), F.lit("hex"))
    meta = F.struct(
        (F.length(F.col(text_col)) % 64 + 8).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 48 + 8).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.length(F.col(text_col)) * 10).cast("int").alias("duration_ms"),
        F.lit("fake").alias("format"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(modality).alias("modality"),
        content.alias("content"),
        meta.alias("meta"),
    )


def _decode_bytes(blob: bytes, real_codec: bool = False):
    """THE STUB: deterministic fake decode.  A real deployment replaces this
    with PIL.Image.open / soundfile.read; those libs are absent here.

    The fake keys off the blob's lowercase HEX rendering (not the raw
    bytes) so a SQL engine can reproduce it exactly — md5 over arbitrary
    binary is Python-only, but md5 over the hex string exists everywhere,
    which is what lets the driver's DuckDB oracle hash-check the decode
    pipeline instead of settling for a rows-only count."""
    if real_codec:
        raise NotImplementedError(
            "real image/audio codecs (PIL/soundfile/ffmpeg) are not available "
            "in this environment; _decode_bytes runs a deterministic fake"
        )
    digest = hashlib.md5(blob.hex().encode()).digest()
    return digest + blob  # 'pixels' = digest-prefixed payload, deterministic


def decode_image_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Image decode + feature extraction over ``MEDIA_SCHEMA`` rows.

    One Arrow batch in → one pandas frame of features out; the blob column
    never materializes driver-side."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                pixels = np.frombuffer(_decode_bytes(bytes(blob)), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": int(meta["width"]),
                        "height": int(meta["height"]),
                        "n_bytes": int(len(blob)),
                        "mean_byte": float(round(pixels.astype(np.float64).mean(), 6)),
                        "fingerprint": hashlib.md5(bytes(blob).hex().encode()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Audio decode stub → per-clip RMS etc.  Same plumbing contract."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                samples = np.frombuffer(_decode_bytes(bytes(blob)), dtype=np.uint8).astype(
                    np.float64
                )
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sample_rate": int(meta["sample_rate"]),
                        "duration_ms": int(meta["duration_ms"]),
                        "n_bytes": int(len(blob)),
                        "rms": float(round(float(np.sqrt((samples**2).mean())), 6)),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content", "meta").mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, max_frames: int = 8) -> DataFrame:
    """Video frame sampling stub: explode each blob into every_n-th 'frame'
    (fixed-size byte slices standing in for decoded frames).  The row
    explosion happens inside the executor — the driver never sees frames."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                data = _decode_bytes(bytes(blob))
                frame_size = max(4, len(data) // 16)
                frames = [
                    data[i * frame_size : (i + 1) * frame_size]
                    for i in range(min(16, len(data) // frame_size))
                ]
                for idx in range(0, len(frames), every_n):
                    if idx // every_n >= max_frames:
                        break
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_index": idx,
                            "frame_bytes": frames[idx],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)

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


def _decode_bytes(blob: bytes):
    """THE DEFAULT (fake) CODEC: deterministic fake decode used when no real
    codec is plugged in — the decode libs (PIL/soundfile/ffmpeg) are absent
    in this environment.

    The fake keys off the blob's lowercase HEX rendering (not the raw
    bytes) so a SQL engine can reproduce it exactly — md5 over arbitrary
    binary is Python-only, but md5 over the hex string exists everywhere,
    which is what lets the driver's DuckDB oracle hash-check the decode
    pipeline instead of settling for a rows-only count."""
    digest = hashlib.md5(blob.hex().encode()).digest()
    return digest + blob  # 'pixels' = digest-prefixed payload, deterministic


# -- real codec hooks ---------------------------------------------------------
#
# Each operator below takes a ``codec`` callable ``bytes -> np.ndarray`` (flat
# sample/pixel array).  The callable is captured in the mapInPandas closure,
# so it is cloudpickled to every executor — a module-global registry would
# silently reset to the default when the worker re-imports this module, which
# is why the hook is an argument, not mutable global state.


def fake_codec(blob: bytes):
    """Default: the deterministic fake, as a flat uint8 array."""
    import numpy as np

    return np.frombuffer(_decode_bytes(blob), dtype=np.uint8)


def pil_image_codec(blob: bytes):
    """Real image decode via Pillow -> flat uint8 pixel array.  Import-gated:
    raises NotImplementedError (with the real cause chained) when Pillow is
    not installed, so a misconfigured cluster fails loudly, not wrongly."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised only without PIL
        raise NotImplementedError(
            "pil_image_codec requires Pillow; install it on the executors or "
            "use the default deterministic fake codec"
        ) from e
    img = Image.open(io.BytesIO(blob))
    return np.asarray(img).reshape(-1).astype(np.uint8)


def png_image_codec(blob: bytes):
    """REAL PNG decode using only the standard library (zlib + struct) —
    the zero-dependency real-codec path, so CI proves the codec contract
    against genuinely encoded bytes even where Pillow is absent.

    Supports the common archive shape: 8-bit, non-interlaced, grey / RGB /
    grey+alpha / RGBA, all five scanline filters.  Anything fancier
    (palette, 16-bit, interlaced) should go through ``pil_image_codec``."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    ihdr = None
    idat = []
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG stream missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
        raise ValueError(
            "png_image_codec supports 8-bit non-interlaced grey/RGB/LA/RGBA; "
            "use pil_image_codec for palette/16-bit/interlaced streams"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        if f == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        out += row
        prev = row
    return np.frombuffer(bytes(out), dtype=np.uint8)


def wav_audio_codec(blob: bytes):
    """REAL WAV/PCM decode using only the standard library (wave) -> flat
    float64 samples in [-1, 1] — the zero-dependency real-codec path for
    audio, mirroring ``png_image_codec``.  Compressed containers (flac/ogg/
    mp3) go through ``soundfile_audio_codec``."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob)) as wf:
        width = wf.getsampwidth()
        data = wf.readframes(wf.getnframes())
    if width == 2:
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if width == 1:  # 8-bit WAV is unsigned
        return (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if width == 4:
        return np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    raise ValueError(f"unsupported WAV sample width {width}")


def soundfile_audio_codec(blob: bytes):
    """Real audio decode via soundfile -> flat float64 sample array in
    [-1, 1].  Import-gated like ``pil_image_codec``."""
    try:
        import io

        import numpy as np
        import soundfile as sf
    except ImportError as e:  # pragma: no cover - exercised only without lib
        raise NotImplementedError(
            "soundfile_audio_codec requires soundfile; install it on the "
            "executors or use the default deterministic fake codec"
        ) from e
    data, _rate = sf.read(io.BytesIO(blob))
    return np.asarray(data, dtype=np.float64).reshape(-1)


def decode_image_features(
    df: DataFrame, batch_hint: int | None = None, codec=None
) -> DataFrame:
    """Image decode + feature extraction over ``MEDIA_SCHEMA`` rows.

    One Arrow batch in → one pandas frame of features out; the blob column
    never materializes driver-side.  ``codec`` is ``bytes -> flat uint8
    ndarray`` (e.g. ``pil_image_codec``); defaults to the deterministic fake.
    """
    codec = codec or fake_codec

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                pixels = np.asarray(codec(bytes(blob)))
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


def decode_audio_features(df: DataFrame, codec=None) -> DataFrame:
    """Audio decode → per-clip RMS etc.  Same plumbing contract; ``codec`` is
    ``bytes -> flat sample ndarray`` (e.g. ``soundfile_audio_codec``)."""
    codec = codec or fake_codec

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                samples = np.asarray(codec(bytes(blob))).astype(np.float64)
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


def sample_frames(
    df: DataFrame, every_n: int = 4, max_frames: int = 8, codec=None
) -> DataFrame:
    """Video frame sampling: explode each blob into every_n-th 'frame'
    (fixed-size byte slices of the decoded stream; a real ffmpeg codec would
    return actual frames).  The row explosion happens inside the executor —
    the driver never sees frames."""
    codec = codec or fake_codec

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                data = np.asarray(codec(bytes(blob))).astype(np.uint8).tobytes()
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


RESIZE_SCHEMA = (
    "media_id bigint, out_width int, out_height int, n_bytes int, "
    "mean_byte double, resized binary"
)


def resize_images(
    df: DataFrame, out_width: int = 8, out_height: int = 8, codec=None
) -> DataFrame:
    """Image resize over ``MEDIA_SCHEMA`` rows: decode via ``codec``, nearest-
    neighbor downsample the flat pixel stream to out_width*out_height, emit
    the resized bytes + summary stats.

    With a real codec (``pil_image_codec``) this is thumbnailing for vision-
    model preprocessing; with the default fake it is the same plumbing over
    the deterministic payload, so schema/batching/partitioning are tested
    even without decode libs.  Scale notes as decode_image_features: Arrow
    batches in and out, blob never driver-side, stateless kernel (safe under
    task retry/speculation)."""
    codec = codec or fake_codec
    n_out = out_width * out_height

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                px = np.asarray(codec(bytes(blob))).astype(np.uint8)
                if px.size == 0:
                    px = np.zeros(1, dtype=np.uint8)
                # nearest-neighbor over the flat stream: index floor(i*n/t)
                idx = (np.arange(n_out) * px.size) // n_out
                resized = px[idx]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "out_width": out_width,
                        "out_height": out_height,
                        "n_bytes": int(resized.size),
                        "mean_byte": float(round(resized.astype(np.float64).mean(), 6)),
                        "resized": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, schema=RESIZE_SCHEMA)


PHASH_SCHEMA = "media_id bigint, n_pixels int, phash bigint"


def perceptual_hash(df: DataFrame, bits: int = 32, codec=None) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over decoded pixels: bit
    ``i`` is set iff pixel ``i`` is above the window mean.  The comparison is
    done on the integer grid (``pixel * n > sum``) so any engine reproduces
    it exactly — no float mean ever exists.

    With a real image codec the input pixels are a decoded grayscale
    thumbnail and this is the standard web-scale image near-dup fingerprint;
    with the default deterministic fake the plumbing, schema, and hash math
    are identical and fully oracle-checkable.

    Scale: pure map — one Arrow kernel pass, blobs never leave the executor,
    output is (id, int, int64).  Pair finding is a separate banded join
    (``phash_hamming_pairs``), so the fingerprint table is the ONLY thing
    that ever shuffles.
    """
    codec = codec or fake_codec

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                px = np.asarray(codec(bytes(blob))).astype(np.int64)
                win = px[:bits]
                n, s = len(win), int(win.sum())
                h = 0
                for i, p in enumerate(win):
                    if int(p) * n > s:
                        h |= 1 << i
                rows.append(
                    {"media_id": int(media_id), "n_pixels": int(len(px)), "phash": h}
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, schema=PHASH_SCHEMA)


def phash_hamming_pairs(
    hashes: DataFrame, bits: int = 32, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: band each hash
    into ``bands`` equal bit-slices, equi-join on any identical slice,
    verify with exact Hamming distance.  Same pigeonhole guarantee as
    ``dedup.simhash_pairs`` — with ``max_hamming < bands`` recall is FULL
    while the join stays an equi-join on a small integer key (never an
    all-pairs comparison), which is what makes image dedup feasible on a
    billion-image crawl.

    ``hashes`` is ``perceptual_hash`` output.  Returns (id1, id2, hamming).
    """
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    banded = hashes.select(
        F.col("media_id").alias("id"),
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(phash, band * {width}) & {(1 << width) - 1}"),
    )
    a = banded.select(
        F.col("band").alias("b1"), F.col("band_val").alias("v1"),
        F.col("id").alias("id1"), F.col("phash").alias("h1"),
    )
    b = banded.select(
        F.col("band").alias("b2"), F.col("band_val").alias("v2"),
        F.col("id").alias("id2"), F.col("phash").alias("h2"),
    )
    return (
        a.join(
            b,
            (F.col("b1") == F.col("b2"))
            & (F.col("v1") == F.col("v2"))
            & (F.col("id1") < F.col("id2")),
        )
        .select("id1", "id2", F.expr("bit_count(h1 ^ h2)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

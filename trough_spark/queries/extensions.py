"""Multimodal + native-streaming inventory entries.

The decode kernels run as Arrow mapInPandas with a deterministic hex-keyed
fake codec, which makes their outputs SQL-expressible — image/audio feature
queries carry full DuckDB oracles.  Frame sampling emits binary columns
(engine renderings differ) and native session_window has no SQL twin, so
those two stay rows-only with pytest assertions instead
(tests/test_multimodal.py, tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import multimodal as M
from trough_spark.queries import query
from trough_spark.streaming import events as E
from trough_spark.tables import load_table as T


_MM_SRC = """
    src AS (
      SELECT doc_id AS media_id, md5(text) AS chex,
             CAST(length(text) % 64 + 8 AS INT) AS width,
             CAST(length(text) % 48 + 8 AS INT) AS height,
             CAST(length(text) * 10 AS INT) AS duration_ms
      FROM documents
    ),
    bytes AS (
      SELECT media_id,
             CAST(('0x' || substr(md5(chex), 2 * i.range + 1, 2)) AS INT) AS db,
             CAST(('0x' || substr(chex,      2 * i.range + 1, 2)) AS INT) AS cb
      FROM src, range(16) i
    )
"""


@query(
    "multimodal_image_features",
    oracle=f"""
    WITH {_MM_SRC},
    agg AS (SELECT media_id, SUM(db) + SUM(cb) AS sb FROM bytes GROUP BY media_id)
    SELECT s.media_id, s.width, s.height, CAST(16 AS INT) AS n_bytes,
           ROUND((a.sb) / 32.0, 6) AS mean_byte,
           md5(s.chex) AS fingerprint
    FROM src s JOIN agg a ON a.media_id = s.media_id
    """,
)
def multimodal_image_features(spark, sf_dir):
    """Image decode + features through the Arrow mapInPandas kernel.  The
    deterministic fake decode keys off the blob's hex rendering, so the
    oracle reproduces the 'pixel' statistics exactly (md5-of-hex; see
    operators/multimodal._decode_bytes) — the decode PIPELINE is
    hash-verified even though the codec itself is a stub."""
    docs = T(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, "doc_id", "text", modality="image")
    return M.decode_image_features(media)


@query(
    "multimodal_audio_features",
    oracle=f"""
    WITH {_MM_SRC},
    agg AS (
      SELECT media_id, SUM(db * db) + SUM(cb * cb) AS ssq FROM bytes GROUP BY media_id
    )
    SELECT s.media_id, CAST(16000 AS INT) AS sample_rate, s.duration_ms,
           CAST(16 AS INT) AS n_bytes,
           ROUND(sqrt((a.ssq) / 32.0), 6) AS rms
    FROM src s JOIN agg a ON a.media_id = s.media_id
    """,
)
def multimodal_audio_features(spark, sf_dir):
    """Audio decode + RMS through the same kernel contract, hash-verified
    like the image path (exact integer sums of 'sample' bytes; one sqrt +
    round at the boundary)."""
    docs = T(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, "doc_id", "text", modality="audio")
    return M.decode_audio_features(media)


@query("multimodal_frame_sample")  # rows-only: executor-side frame explosion
def multimodal_frame_sample(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").limit(100)
    media = M.synthesize_media(docs, "doc_id", "text", modality="video")
    return M.sample_frames(media, every_n=2, max_frames=4).select(
        "media_id", "frame_index", F.length("frame_bytes").alias("frame_len")
    )


@query("stream_session_window_native")  # rows-only: native session_window op
def stream_session_window_native(spark, sf_dir):
    # The streaming-native gap-session operator run in batch mode; its
    # stream/batch consistency is asserted in tests/test_streaming.py.
    return E.session_windows(T(spark, sf_dir, "events"), gap="30 minutes")


@query(
    "skew_salted_aggregation",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted_aggregation(spark, sf_dir):
    # Two-phase salted aggregation over a deliberately low-cardinality key
    # (3 groups = maximal skew): identical results to the plain GROUP BY
    # oracle, but the hot keys spread over 16 reducers in phase 1
    # (operators/skew.py).
    from trough_spark.operators.skew import salted_agg

    l = T(spark, sf_dir, "lineitem")
    return salted_agg(
        l,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), F.sum),
            "total_qty": (F.sum(F.col("l_quantity").cast("bigint")), F.sum),
            "max_price": (F.max(F.col("l_extendedprice").cast("double")), F.max),
        },
        n_salts=16,
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT s.s_nationkey,
           CAST(CAST(SUM(l.l_quantity) AS DOUBLE) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted fact⋈dim join: lineitem salted 8 ways, supplier replicated
    8x, joined on (suppkey, salt) — a hot supplier's rows spread over 8
    reducers instead of one.  The oracle is the PLAIN join (salting must
    not change the result set).  This is the manual skew tool for the gap
    AQE can't cover: a probe side too big to broadcast under a skewed
    build key (see operators/skew.salted_join)."""
    from trough_spark.operators import skew as K

    li = T(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = K.salted_join(li, sup, "l_suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id, md5(md5(text)) || md5(text) AS ph
      FROM documents
    ),
    b AS (
      SELECT media_id, i,
             CAST(('0x' || substr(ph, ((i * 32) // 25) * 2 + 1, 2)) AS INT) AS v
      FROM p, UNNEST(generate_series(0, 24)) AS t(i)
    )
    SELECT media_id,
           CAST(5 AS INT) AS out_width,
           CAST(5 AS INT) AS out_height,
           CAST(25 AS INT) AS n_bytes,
           ROUND(AVG(v), 6) AS mean_byte
    FROM b
    GROUP BY media_id
    """,
)
def multimodal_resize(spark, sf_dir):
    """Nearest-neighbor thumbnail resize through the Arrow kernel (5x5 from
    the 32-byte fake payload; a real deployment passes pil_image_codec).
    The oracle re-derives every sampled byte from the payload's hex
    rendering, so even the RESIZE kernel is hash-checked, not rows-only."""
    docs = T(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, "doc_id", "text")
    return M.resize_images(media, 5, 5).select(
        "media_id", "out_width", "out_height", "n_bytes", "mean_byte"
    )

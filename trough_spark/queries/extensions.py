"""Multimodal + native-streaming inventory entries.

The decode kernels run as Arrow mapInPandas with a deterministic hex-keyed
fake codec, which makes their outputs SQL-expressible — every multimodal
query carries a full DuckDB oracle (frame sampling emits frame hex, which
both engines render identically).  Native session_window has no SQL twin
either, but its sessions provably equal the LAG-gap derivation
(tests/test_streaming.py), so it shares that SQL as its oracle.
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


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH src AS (
      SELECT doc_id AS media_id, md5(text) AS chex
      FROM documents WHERE doc_id < 100
    ),
    d AS (SELECT media_id, md5(chex) || chex AS datahex FROM src),
    f AS (
      SELECT media_id, CAST(i.range * 2 AS INT) AS frame_index,
             substr(datahex, i.range * 2 * 8 + 1, 8) AS frame_hex
      FROM d, range(4) i
    )
    SELECT media_id, frame_index, CAST(4 AS INT) AS frame_len, frame_hex FROM f
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame sampling through the executor-side explosion kernel,
    hash-verified: the fake codec's decoded stream is md5(hex(blob))+blob,
    so every sampled frame is a fixed hex substring the oracle re-derives
    (32-byte stream, 4-byte frames, every 2nd frame, cap 4 — indices
    0/2/4/6 at hex offsets idx*8).  Binary stays executor-side; the query
    emits the frame's hex rendering, comparable across engines."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = M.synthesize_media(docs, "doc_id", "text", modality="video")
    return M.sample_frames(media, every_n=2, max_frames=4).select(
        "media_id",
        "frame_index",
        F.length("frame_bytes").cast("int").alias("frame_len"),
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
    )


@query(
    "stream_session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def stream_session_window_native(spark, sf_dir):
    # The streaming-native gap-session operator run in batch mode.  The
    # oracle is the LAG-based gap derivation (same SQL family as the
    # stream_sessionization oracle): session_window's merge rule — an event
    # lands in the open session iff it falls strictly inside
    # [start, last_ts + gap) — produces exactly the sessions the
    # "gap > 30 min starts a new session" recurrence does, so the two are
    # hash-comparable on (user_id, session_start, n_events).  session_end
    # is excluded: session_window defines it as last_ts + gap, the batch
    # derivation as max(ts) — both valid, not comparable.
    # Stream-vs-batch and native-vs-lag equalities are also asserted in
    # tests/test_streaming.py.
    return E.session_windows(T(spark, sf_dir, "events"), gap="30 minutes").select(
        "user_id", "session_start", "n_events"
    )


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


@query(
    "multimodal_phash",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id, md5(md5(text)) || md5(text) AS ph
      FROM documents
    ),
    px AS (
      SELECT media_id, i,
             CAST(('0x' || substr(ph, i * 2 + 1, 2)) AS BIGINT) AS v
      FROM p, UNNEST(generate_series(0, 31)) AS t(i)
    ),
    tot AS (
      SELECT media_id, SUM(v) AS s FROM px GROUP BY media_id
    )
    SELECT px.media_id,
           CAST(32 AS INT) AS n_pixels,
           CAST(COALESCE(SUM(CASE WHEN v * 32 > s THEN (CAST(1 AS BIGINT) << i) END), 0)
                AS BIGINT) AS phash
    FROM px JOIN tot USING (media_id)
    GROUP BY px.media_id
    """,
)
def multimodal_phash(spark, sf_dir):
    """Perceptual average-hash fingerprints over the synthesized media
    corpus — the map-only first stage of web-scale image near-dup (pair
    finding is `phash_hamming_pairs`, a banded equi-join verified in
    tests/test_multimodal.py).  Bit math is on the integer grid
    (pixel * n > sum), so the DuckDB oracle re-derives every bit from the
    payload's hex rendering and the hash check is exact."""
    docs = T(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, "doc_id", "text")
    return M.perceptual_hash(media, bits=32)

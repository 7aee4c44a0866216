"""Rows-only inventory entries: operators whose semantics are not
SQL-expressible for the DuckDB oracle (Pandas-UDF kernels, native
session_window).  The driver records a weaker rows-only check for these;
their correctness is asserted in the pytest suite instead
(tests/test_multimodal.py, tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import multimodal as M
from trough_spark.queries import query
from trough_spark.streaming import events as E
from trough_spark.tables import load_table as T


@query("multimodal_image_features")  # rows-only: mapInPandas decode kernel
def multimodal_image_features(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, "doc_id", "text", modality="image")
    return M.decode_image_features(media)


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

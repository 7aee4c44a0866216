"""Event-stream pipelines over the `events` schema
(event_id, ts, user_id, event_type, value, props).

Each builder takes a streaming OR batch DataFrame with that schema and
returns the transformed frame — the same logical plan serves
``spark.readStream`` (incremental, stateful) and ``spark.read`` (the batch
backfill), which is exactly how a 100 TB pipeline should be written once and
run in both modes.  Batch-mode equivalents of these are registered as
correctness queries in queries/streaming.py; the true streaming execution is
exercised in tests/test_streaming.py with a file source + memory sink.

Scale notes:
- watermarks bound state: tumbling/sliding aggregations keep only open
  windows per key; late rows beyond the watermark are dropped deterministically.
- sessionization uses session_window (state per active session, closed by
  the watermark), not a global sort — the batch equivalent (lag + cumulative
  sum) would be a full shuffle-and-sort at stream scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-source event stream: each parquet file dropped into ``path`` is a
    micro-batch — the streaming analogue of the reference's discrete
    write-POST ingest model (reference: trough/write.py:47-61)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data handling."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide buckets)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Streaming: ``session_window`` keeps state only for open sessions and the
    watermark closes them — O(active users) state, not O(history).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def write_to_segments(
    stream: DataFrame, store, table: str, checkpoint: str, segment_col: str = "segment_id"
):
    """foreachBatch sink: upsert each micro-batch into the segment store —
    the streaming write path for the engine's partitioned tables (batch
    commit per trigger ≡ the reference's one-transaction-per-POST,
    trough/write.py:39)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        store.append_dataframe(table, batch_df)

    return stream.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint)

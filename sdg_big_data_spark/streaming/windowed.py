"""Event-time windowed streaming aggregations — stretch scope beyond the
reference (SURVEY.md §2.11: the reference has no true streaming; its
2-day overlap rewind is a manual watermark). These are the idiomatic
Structured Streaming forms of the engine's batch window operators, for
deployments where the event feed IS a stream:

- tumbling / sliding window counts+sums with a real watermark
  (`F.window`), replacing the rewind-and-rededup dance;
- session windows (`F.session_window`) — the streaming analogue of the
  gap-based sessionization the stop-detection pipeline uses (g_sessionize).

State design at scale: watermark delay bounds state size (groups older
than the delay are finalized and evicted); keys are (entity, window), so
state is proportional to active entities × open windows, not to events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    time_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregate. Works on a streaming OR
    batch DataFrame (same plan semantics; batch just has no state)."""
    src = events.withWatermark(time_col, watermark) if events.isStreaming else events
    return src.groupBy(
        F.window(F.col(time_col), window_len).alias("win"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *group_cols,
        "n_events",
        "total_value",
    )


def session_aggregate(
    events: DataFrame,
    time_col: str = "ts",
    gap: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregate: a session closes after ``gap`` of
    inactivity per key — the streaming form of stop detection's max-gap
    segmentation (`wbgps/stops.py` gap semantics, g_sessionize batch
    form)."""
    src = events.withWatermark(time_col, watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window(F.col(time_col), gap).alias("sess"), key_col
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ).select(
        key_col,
        F.col("sess.start").alias("sess_start"),
        F.col("sess.end").alias("sess_end"),
        "n_events",
        "total_value",
    )


def run_stream_to_parquet(
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    output_mode: str = "append",
):
    """Drive a windowed streaming frame to parquet with availableNow
    (exactly-once over currently-available input)."""
    q = (
        stream.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

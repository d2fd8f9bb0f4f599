"""Structured Streaming windowed aggregations over the events stream
(SURVEY.md §2.7 T6 — capability the reference lacks entirely).

Each builder takes a *streaming* DataFrame (``spark.readStream``) with
the events schema and returns the windowed aggregation; the same
builder applied to a batch DataFrame yields the batch-equivalent
result, which is how tests verify them (memory sink vs batch run).

Watermarks bound state: late events beyond the delay are dropped, so
state per window is finite no matter how long the stream runs — the
property that matters at 100 TB/day ingest. The precise drop
semantics (window_end <= watermark, evaluated against the previous
batch's watermark) are pinned end-to-end in
tests/test_streaming.py::test_watermark_drops_late_rows_append_mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Per-window, per-type counts + value sum (append-mode capable)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows — each event lands in window/slide buckets."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time session windows per user (gap-based) — the streaming
    twin of the batch lag+cumsum sessionization in plans/events.py."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )

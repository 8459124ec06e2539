"""Structured Streaming variants of the batch operators (SURVEY.md §2.8).

The reference is batch-only; these exist so the same feature semantics run
over an unbounded source: gap-based sessionization via ``session_window``
(the streaming twin of operators/sessionize.py) and watermarked tumbling
window statistics. Both are plain readStream transformations — state
management, late-data handling and checkpointing come from the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: session_window closes a session once no
    event arrives within the gap; the watermark bounds state. Emits one row
    per (entity, session) with bounds and event count — the streaming analog
    of operators/sessionize.session_bounds."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
            F.col(entity_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            entity_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_windowed_stats(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregates per entity."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("win_sum"),
            F.avg(value_col).alias("win_avg"),
        )
        .select(
            entity_col,
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "win_sum",
            "win_avg",
        )
    )

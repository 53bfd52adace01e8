"""Structured Streaming variants of the engine's stateful operators.

The reference is batch-only (SURVEY §2.3: "no streaming construct" —
documented as out of scope there); these operators are part of the
beyond-reference surface: the same sessionization semantics as
SplitTripLegs/q08 expressed over an unbounded stream, plus watermarked
windowed aggregation for late data.

Both functions accept a streaming OR batch DataFrame (same code path —
Spark unifies them), so the batch oracle can verify the streaming
logic on finite input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per key.

    On a stream, the watermark bounds state: windows older than
    ``watermark`` close and emit. On a batch frame the same plan just
    aggregates.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key with the built-in ``session_window``
    (gap-based — the streaming analog of the lag+cumsum sessionization
    in q08/SplitTripLegs). Emits one row per closed session."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )

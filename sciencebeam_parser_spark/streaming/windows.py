"""Streaming window transformations.

Each function takes a (possibly streaming) DataFrame with an event-time
column and returns the transformed DataFrame; callers attach sources
(``spark.readStream...``) and sinks (``writeStream.foreachBatch`` /
``memory``). Watermarks bound state (late data beyond the watermark is
dropped) — required for append-mode aggregations.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *group_cols, "n", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def sessionized_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) — the streaming analog of the reference's
    per-session temp-dir scoping (app/parser.py:239-247)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Stateful dedup within the watermark — idempotent re-submission of the
    same document (SURVEY §2B: dropDuplicatesWithinWatermark)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )

"""Event-stream operators (sessionization, tumbling windows).

Batch DataFrame forms here (SQL-mirrorable for the oracle gate); the same
transformations run under Structured Streaming via ``readStream`` +
``window()``/``session_window()`` — see :func:`streaming_tumbling` which
builds the streaming variant of the tumbling aggregation with a watermark.
The reference pipeline has no streaming semantics (SURVEY.md §2.10), so this
module is engine capability surface, not parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session counts per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``.
    Output: (user_id, n_sessions, n_events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")  # NTZ-safe epoch seconds
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        events.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Hourly tumbling counts + mean value per event type.
    Output: (window_start, event_type, n, avg_value)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


def streaming_tumbling(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Structured Streaming variant: tumbling 1h windows with late-data
    watermark.  ``stream`` must be a streaming DataFrame (readStream)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "avg_value")
    )

"""Streaming census windows: the Structured Streaming twin of
``ops.events.hourly`` (reference ``census/src/stats.rs:23-70`` — per-window
counts over a live event feed; the daemon recomputes census stats on a
cadence, here the engine maintains them incrementally as events arrive).

Batch and stream share the same aggregation shape AND output schema
(tumbling event-time hour, per event_type: ``n`` + 6dp-rounded
``sum_value_r``), so a backfill computed with the batch op and a live tail
computed with this stream agree row-for-row on closed windows — the
standard lambda-unification check, tested in ``tests/test_streaming.py``.

At scale: the windowed aggregation is a streaming state-store agg keyed by
(window, event_type) — cardinality is bounded by types × open windows, and
the watermark bounds "open", so state never grows with event volume. Late
events beyond the watermark are dropped (the reference's census likewise
ignores samples older than its window horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 1-hour census windows over a streaming events source.

    ``events`` must carry (ts timestamp, event_type string, value double) —
    the testdata events shape. Output matches ``ops.events.hourly`` exactly:
    (hour_ts, event_type, n, sum_value_r). In append output mode a window
    row is emitted exactly once, when the watermark passes its end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_ts"),
            "event_type",
            "n",
            "sum_value_r",
        )
    )

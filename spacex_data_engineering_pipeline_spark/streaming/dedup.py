"""Streaming deduplication (SURVEY §2.9 notes the reference has no
stateful dedup; a streaming ingest at scale needs one).

Two engine-native tiers:
- ``dedup_exact_stream``: ``dropDuplicates`` on the event key — state
  grows with distinct keys forever; only for bounded key domains.
- ``dedup_within_watermark``: ``dropDuplicatesWithinWatermark`` — the
  scale path: duplicates are only ever near-in-time (retries,
  at-least-once redelivery), so state for a key is dropped once the
  watermark passes it. State size is bounded by (key arrival rate ×
  watermark delay), independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact_stream(events_stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unbounded-state exact dedup (bounded key domains only)."""
    return events_stream.dropDuplicates(key_cols)


def dedup_within_watermark(
    events_stream: DataFrame,
    key_cols: list[str],
    event_time_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Bounded-state dedup: drops re-deliveries of a key arriving within
    the watermark horizon; state expires as event time advances.
    """
    ts_type = dict(events_stream.dtypes).get(event_time_col)
    if ts_type == "timestamp_ntz":
        from pyspark.sql import functions as F

        events_stream = events_stream.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp")
        )
    return events_stream.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(key_cols)

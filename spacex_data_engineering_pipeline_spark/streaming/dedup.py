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

    CAVEAT — late-data loss mode: like every watermark-gated operator,
    events (unique or not) arriving with event time older than the
    watermark are DROPPED, not passed through. Size ``watermark_delay``
    to exceed both the redelivery window AND the source's worst-case
    event-time lateness (backfills, lagging partitions).

    The event-time column keeps its input type: an NTZ column is cast
    to an instant only for the watermark and cast back on output.
    """
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.streaming.event_time import (
        restore_ntz,
        to_instant_for_watermark,
    )

    events_stream, was_ntz = to_instant_for_watermark(events_stream, event_time_col)
    deduped = events_stream.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(key_cols)
    return deduped.withColumn(
        event_time_col, restore_ntz(F.col(event_time_col), was_ntz)
    )

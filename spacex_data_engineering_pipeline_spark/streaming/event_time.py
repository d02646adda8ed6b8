"""Event-time boundary helpers shared by streaming operators.

Watermarks require an instant-typed (TIMESTAMP) event-time column; the
engine's tables surface wall-clock TIMESTAMP_NTZ (see catalog.py). The
pair below makes the NTZ→instant→NTZ round-trip explicit and identical
everywhere, so no operator mutates its output schema or shifts values
(an NTZ→LTZ cast uses the session timezone; casting back with the same
session timezone is an exact inverse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_instant_for_watermark(df: DataFrame, event_time_col: str) -> tuple[DataFrame, bool]:
    """Cast an NTZ event-time column to TIMESTAMP so withWatermark
    accepts it; returns (df, was_ntz) — pass ``was_ntz`` to
    :func:`restore_ntz` on every output time column.
    """
    was_ntz = dict(df.dtypes).get(event_time_col) == "timestamp_ntz"
    if was_ntz:
        df = df.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    return df, was_ntz


def restore_ntz(col: Column, was_ntz: bool) -> Column:
    """Invert :func:`to_instant_for_watermark` on an output column."""
    return col.cast("timestamp_ntz") if was_ntz else col

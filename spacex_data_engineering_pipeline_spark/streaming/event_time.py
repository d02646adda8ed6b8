"""Event-time boundary helpers shared by streaming operators.

Watermarks require an instant-typed (TIMESTAMP) event-time column; the
engine's tables surface wall-clock TIMESTAMP_NTZ (see catalog.py). The
pair below makes the NTZ→instant→NTZ round-trip explicit and identical
everywhere, WITHOUT touching the session timezone: the wall-clock value
is interpreted AS UTC (``make_timestamp(..., 'UTC')``), not as
session-local (a plain ``cast`` would be).

Why that matters beyond symmetry: event-time WINDOW buckets align to
the epoch on the instant timeline. Under a session cast, a fractional-
offset timezone (Asia/Kathmandu, +05:45) shifts every wall time by
-05:45 before bucketing, so "hourly" windows cut at :45 past the wall
hour — values round-trip fine, but the BUCKETING moves. Interpreting
walls as UTC makes window boundaries, watermark comparisons, and
restored outputs all session-independent (and sidesteps DST-ambiguous
wall times entirely — UTC has none, so the mapping is bijective).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def instant_expr(df: DataFrame, event_time_col: str) -> Column:
    """The column's value on the INSTANT timeline, session-independent:
    an NTZ wall-clock is interpreted AS UTC; an instant column passes
    through. Use anywhere event times feed epoch arithmetic that must
    not move with ``spark.sql.session.timeZone``."""
    if dict(df.dtypes).get(event_time_col) != "timestamp_ntz":
        return F.col(event_time_col)
    c = f"`{event_time_col}`"
    return F.expr(
        f"make_timestamp(year({c}), month({c}), day({c}), hour({c}), "
        f"minute({c}), cast(date_format({c}, 'ss.SSSSSS') as decimal(16,6)), "
        f"'UTC')"
    )


def to_instant_for_watermark(df: DataFrame, event_time_col: str) -> tuple[DataFrame, bool]:
    """Cast an NTZ event-time column to TIMESTAMP so withWatermark
    accepts it — interpreting the wall-clock AS UTC, independent of the
    session timezone; returns (df, was_ntz) — pass ``was_ntz`` to
    :func:`restore_ntz` on every output time column.
    """
    was_ntz = dict(df.dtypes).get(event_time_col) == "timestamp_ntz"
    if was_ntz:
        df = df.withColumn(event_time_col, instant_expr(df, event_time_col))
    return df, was_ntz


def restore_ntz(col: Column, was_ntz: bool) -> Column:
    """Invert :func:`to_instant_for_watermark` on an output column:
    the instant's UTC wall time comes back as the NTZ value."""
    if not was_ntz:
        return col
    return F.convert_timezone(None, F.lit("UTC"), col).cast("timestamp_ntz")

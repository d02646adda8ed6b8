"""Interval helpers shared by the analytics surfaces.

The reference carries TWO hour-interval semantics (SURVEY F2 vs F3):
Trino ``date_diff('hour', ...)`` (whole hours) on the analytics SQL and
Postgres ``EXTRACT(EPOCH)/3600`` (fractional) in the aggregation
service. Both live here so a semantics fix lands in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def whole_hours_between(start: Column, end: Column) -> Column:
    """Whole elapsed hours via ``floor(epoch_delta / 3600)`` as BIGINT.

    REQUIRES ``start <= end`` (apply the theta filter first, as every
    call site does — reference time_between…sql:27): for negative
    intervals floor rounds toward -inf while Trino's date_diff
    truncates toward zero, so they'd disagree by 1. The DuckDB oracles
    use FLOOR too, keeping cross-engine parity either way.
    """
    return F.floor((F.unix_timestamp(end) - F.unix_timestamp(start)) / 3600).cast("long")


def fractional_hours_between(start: Column, end: Column) -> Column:
    """Fractional hours (reference aggregations.py:333 semantics)."""
    return (F.unix_timestamp(end) - F.unix_timestamp(start)) / F.lit(3600.0)

"""Gap filling (operators/timeseries.py): interpolation math, edge
holds, null-on-observed-day handling, per-group spine bounds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.timeseries import (
    fill_gaps_linear,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, day date, v double")


def _d(s):
    return dt.date.fromisoformat(s)


def test_linear_interpolation_and_flags(spark):
    df = _mk(
        spark,
        [
            ("a", _d("2024-01-01"), 10.0),
            ("a", _d("2024-01-04"), 40.0),  # 2-day gap: expect 20, 30
            ("a", _d("2024-01-05"), 0.0),
        ],
    )
    out = {
        (r["g"], r["day"].isoformat()): (r["v"], r["filled"])
        for r in fill_gaps_linear(df, ["g"], "day", "v").collect()
    }
    assert len(out) == 5
    assert out[("a", "2024-01-01")] == (10.0, False)
    assert out[("a", "2024-01-02")] == (pytest.approx(20.0), True)
    assert out[("a", "2024-01-03")] == (pytest.approx(30.0), True)
    assert out[("a", "2024-01-04")] == (40.0, False)
    assert out[("a", "2024-01-05")] == (0.0, False)


def test_null_observed_value_is_interpolated_over(spark):
    df = _mk(
        spark,
        [
            ("a", _d("2024-01-01"), 10.0),
            ("a", _d("2024-01-02"), None),  # observed day, missing value
            ("a", _d("2024-01-03"), 30.0),
        ],
    )
    out = {
        r["day"].isoformat(): (r["v"], r["filled"])
        for r in fill_gaps_linear(df, ["g"], "day", "v").collect()
    }
    assert out["2024-01-02"] == (pytest.approx(20.0), True)


def test_spine_is_per_group_span(spark):
    """Each group densifies over its OWN [min, max] — no global calendar."""
    df = _mk(
        spark,
        [
            ("a", _d("2024-01-01"), 1.0),
            ("a", _d("2024-01-03"), 3.0),
            ("b", _d("2024-02-10"), 5.0),  # single point: no spine growth
        ],
    )
    rows = fill_gaps_linear(df, ["g"], "day", "v").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["day"].isoformat())
    assert sorted(by_g["a"]) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert by_g["b"] == ["2024-02-10"]


def test_edge_gaps_hold_nearest(spark):
    """A group whose first/last observed values are NULL: leading rows
    backfill from the first observation, trailing rows hold the last."""
    df = _mk(
        spark,
        [
            ("a", _d("2024-01-01"), None),
            ("a", _d("2024-01-02"), 20.0),
            ("a", _d("2024-01-03"), None),
        ],
    )
    out = {
        r["day"].isoformat(): (r["v"], r["filled"])
        for r in fill_gaps_linear(df, ["g"], "day", "v").collect()
    }
    assert out["2024-01-01"] == (20.0, True)
    assert out["2024-01-03"] == (20.0, True)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
for the driver's DuckDB-oracle correctness gate (sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spacex_data_engineering_pipeline_spark.plans import queries as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: delay-by-year over the orders⋈lineitem join —
    exercises scan, filter pushdown, equi-join, theta predicate,
    group-by-year, and truncated-hour interval arithmetic in one plan.
    """
    return _catalog.QUERIES["ship_delay_by_year"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (same column aliases)."""
    return _catalog.oracle_sql()

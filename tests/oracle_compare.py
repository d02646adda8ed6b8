"""Order-insensitive value comparison between a Spark DataFrame and a
DuckDB oracle result — a local mirror of the driver's correctness gate
(row-count + column names + sorted-row value equality).

Values are normalized before comparison: floats rounded to 6 significant
decimals-of-error tolerance via isclose, timestamps/dates to ISO strings,
Decimal to float — so dtype-level differences (int32 vs int64,
timestamp[ns] vs [us]) don't mask real value mismatches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


def compare_to_oracle(spark_df: DataFrame, duck_con, oracle_sql: str) -> None:
    """Assert the Spark result matches the DuckDB oracle, order-insensitive.

    Instant (LTZ) timestamp columns are rendered to strings JVM-side
    with ``date_format``, which uses the SESSION timezone (pinned UTC by
    ``get_spark``) — ``collect()`` would instead convert them through
    the OS-local zone, making the test's pass/fail depend on the
    machine's TZ env (caught by running the suite under Asia/Kathmandu).
    NTZ columns collect as wall-clock and need no help.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    canon = [
        F.date_format(f.name, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(f.name)
        if isinstance(f.dataType, TimestampType)
        else F.col(f.name)
        for f in spark_df.schema.fields
    ]
    spark_df = spark_df.select(canon)
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(_norm(v) for v in row) for row in spark_df.collect()]

    duck_res = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = [tuple(_norm(v) for v in row) for row in duck_res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    # Reorder spark columns to duckdb's column order, then sort rows.
    idx = [spark_cols.index(c) for c in duck_cols]
    spark_rows = [tuple(r[i] for i in idx) for r in spark_rows]
    key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
    spark_rows.sort(key=key)
    duck_rows.sort(key=key)

    mismatches = []
    for i, (srow, drow) in enumerate(zip(spark_rows, duck_rows)):
        for c, (sv, dv) in zip(duck_cols, zip(srow, drow)):
            if not _values_equal(sv, dv):
                mismatches.append((i, c, sv, dv))
    assert not mismatches, f"value mismatches (row, col, spark, duckdb): {mismatches[:10]}"

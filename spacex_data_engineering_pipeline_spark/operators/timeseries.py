"""Time-series gap filling: densify a sparse per-group daily series and
impute the missing points (linear interpolation between the nearest
observed neighbors; edge gaps fall back to nearest-hold).

Scale shape: the spine is generated PER GROUP from that group's own
[min_day, max_day] span (``sequence`` + ``explode``) — no global
calendar cross-join, so spine size is Σ group spans, not
|groups| × |calendar|. The neighbor scan is two frame-bounded window
passes over (group, day) — one shuffle by group key, each partition
sized by the group's span (post-aggregation day counts, not fact
rows). Interpolation is pure codegen arithmetic; the expression tree
is written to match the DuckDB oracle operand-for-operand so the
doubles come out bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps_linear(
    df: DataFrame,
    group_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify ``df`` (one row per (group, day), DATE-typed ``day_col``)
    to every day in each group's observed span, with ``value_col``
    linearly interpolated across gaps and a ``filled`` flag on imputed
    rows. Rows with NULL ``value_col`` on observed days are treated as
    gaps too (interpolated over, not held)."""
    spine = (
        df.groupBy(*group_cols)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(
            *group_cols,
            F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias(day_col),
        )
    )
    joined = spine.join(df, [*group_cols, day_col], "left")

    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*group_cols)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    d = F.col(day_col)
    obs_day = F.when(v.isNotNull(), d)
    pv = F.last(v, ignorenulls=True).over(w_prev)
    pd_ = F.last(obs_day, ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    nd = F.first(obs_day, ignorenulls=True).over(w_next)

    interp = pv + (nv - pv) * (
        F.datediff(d, pd_).cast("double") / F.datediff(nd, pd_).cast("double")
    )
    filled_value = (
        F.when(v.isNotNull(), v)
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .otherwise(F.coalesce(pv, nv))
    )
    return joined.select(
        *group_cols,
        day_col,
        filled_value.alias(value_col),
        v.isNull().alias("filled"),
    )

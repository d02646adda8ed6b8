"""Distributed statistical operators: trend regression, robust
outlier detection, and two-sample (Welch) comparison.

The reference's analytics stop at averages and rates
(reference src/aggregations.py:310-366, sql/analytics/*.sql); a
production analytics engine over the same data also needs the next
tier of statistics — trend lines over time, outlier flags that
survive skewed distributions, and A/B-style group comparisons. All
three are expressed as closed-form aggregations so they stay
JVM-side and shuffle exactly once per grouping:

- ``group_trend``: per-group OLS fit via Spark's built-in
  ``regr_slope / regr_intercept / regr_r2`` aggregates (sufficient
  statistics Σx, Σy, Σxy, Σx² — distributive, map-side combinable).
- ``robust_outlier_stats``: median/MAD z-scores. Median and MAD are
  NOT distributive; at 100 TB the exact form below (two per-group
  ``median`` aggregations + a broadcast join of the group stats) is
  the right trade while group count ≪ row count; for per-row exact
  medians over billions of groups you'd switch the dial to
  ``percentile_approx``.
- ``welch_t``: Welch's unequal-variance t statistic with the
  Welch–Satterthwaite degrees of freedom, from one pass of
  (n, mean, var_samp) per arm — fully distributive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend: slope, intercept, R² and point count of
    ``y_col`` regressed on ``x_col``.

    One shuffle on ``group_cols``; the regr_* aggregates reduce to
    sufficient statistics with map-side partial aggregation, so the
    reduce side sees one record per (partition, group) — the same
    scale shape as a SUM.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.regr_slope(F.col(y_col), F.col(x_col)).alias("slope"),
        F.regr_intercept(F.col(y_col), F.col(x_col)).alias("intercept"),
        F.regr_r2(F.col(y_col), F.col(x_col)).alias("r2"),
    )


def robust_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 6.0,
) -> DataFrame:
    """Per-group robust dispersion (median + MAD) and the count of
    rows whose absolute deviation exceeds ``k`` MADs.

    Median/MAD resist the heavy tails that wreck mean/stddev flags on
    revenue-like columns. Plan shape: two grouped exact-``median``
    aggregations (each one shuffle on ``group_cols``) with the
    group-level stats broadcast back onto the fact rows — the fact
    table itself is scanned twice but never shuffled a second time
    for the join, because group stats are dimension-sized.
    """
    med = df.groupBy(*group_cols).agg(
        F.median(value_col).alias("med"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    with_dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = with_dev.groupBy(*group_cols).agg(
        F.median("__absdev").alias("mad"),
    )
    flagged = (
        with_dev.join(F.broadcast(mad), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.first("med").alias("__med"),
            F.first("mad").alias("__mad"),
            F.first("n_rows").alias("__n"),
            F.sum(
                F.when(
                    F.col("__absdev") > F.lit(float(k)) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            *group_cols,
            F.col("__n").alias("n_rows"),
            F.round("__med", 2).alias("median_value"),
            F.round("__mad", 2).alias("mad_value"),
            "n_outliers",
        )
    )
    return flagged


def welch_t(
    df: DataFrame,
    group_cols: list[str],
    arm_col,
    value_col: str,
) -> DataFrame:
    """Welch's two-sample t statistic per group, comparing rows where
    boolean column/expression ``arm_col`` is true (arm A) vs false
    (arm B) on ``value_col``.

    Single pass: conditional (n, mean, var_samp) per arm are all
    distributive, so this is ONE shuffle on ``group_cols`` with full
    map-side combine — the cheapest possible plan for an A/B readout
    over 100 TB of fact rows. Emits t and the Welch–Satterthwaite
    degrees of freedom; groups where either arm has < 2 rows or zero
    variance in both arms yield NULL t.
    """
    arm = F.when(arm_col, F.col(value_col))
    ctl = F.when(~arm_col, F.col(value_col))
    stats = df.groupBy(*group_cols).agg(
        F.count(arm).alias("n_a"),
        F.avg(arm).alias("mean_a"),
        F.var_samp(arm).alias("var_a"),
        F.count(ctl).alias("n_b"),
        F.avg(ctl).alias("mean_b"),
        F.var_samp(ctl).alias("var_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    num = se2 * se2
    den = (
        (F.col("var_a") / F.col("n_a")) ** 2 / (F.col("n_a") - 1)
        + (F.col("var_b") / F.col("n_b")) ** 2 / (F.col("n_b") - 1)
    )
    valid = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return stats.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round("mean_a", 2).alias("mean_a"),
        F.round("mean_b", 2).alias("mean_b"),
        F.round(
            F.when(valid, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)), 4
        ).alias("t_stat"),
        F.round(F.when(valid, num / den), 2).alias("welch_df"),
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group EXACT weighted median: the smallest value whose
    cumulative weight reaches half the group's total — the
    inventory-weighted / volume-weighted center that plain median
    ignores (a million one-unit rows shouldn't outvote one
    million-unit row).

    A naive ``Window.partitionBy(group).orderBy(value)`` serializes
    each group onto one reducer — with few large groups that is the
    giant-stratum sort the distributed-rank primitive exists to avoid
    (operators/pack.py). Same cure here, generalized to weighted
    sums: rows shuffle on (group, value-range bucket), the running
    weight is base(group, bucket) + within-bucket running sum, where
    the base offsets come from a prefix over the O(groups × buckets)
    bucket-total table. Equal values always share a bucket (the
    bucket is a pure function of the value), so the cumulative weight
    is exact and total across buckets.

    DETERMINISM CONTRACT: exact for integer-valued weights (double
    sums of integers are order-independent below 2^53 — quantize
    fractional weights to micro-units first, the engine's standard
    discipline); the lower-median convention (first value whose
    running weight reaches half the total, ties sharing their RANGE-
    frame cumulative) is closed-form so any engine replays it.
    """
    spark = df.sparkSession
    base_df = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col(weight_col).alias("__w"),
    )
    lo_hi = base_df.agg(
        F.min("__v").alias("lo"), F.max("__v").alias("hi")
    ).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    n = max(2, spark.sparkContext.defaultParallelism * 4)
    if lo is None or hi is None or lo == hi:
        bucket = F.lit(0)
    else:
        width = (float(hi) - float(lo)) / n
        bucket = F.least(
            F.floor((F.col("__v") - F.lit(float(lo))) / F.lit(width)),
            F.lit(n - 1),
        ).cast("int")
    bucketed = base_df.withColumn("__b", bucket)
    btot = bucketed.groupBy(*group_cols, "__b").agg(
        F.sum("__w").alias("__bw")
    )
    bw = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = btot.select(
        *group_cols,
        "__b",
        F.coalesce(F.sum("__bw").over(bw), F.lit(0.0)).alias("__base"),
        F.sum("__bw").over(Window.partitionBy(*group_cols)).alias("__tw"),
    )
    inw = Window.partitionBy(*group_cols, "__b").orderBy("__v")
    cum = (
        bucketed.join(F.broadcast(base), [*group_cols, "__b"])
        .withColumn("__cw", F.col("__base") + F.sum("__w").over(inw))
    )
    return (
        cum.filter(F.col("__cw") * 2 >= F.col("__tw"))
        .groupBy(*group_cols)
        .agg(F.min("__v").alias("weighted_median"))
    )

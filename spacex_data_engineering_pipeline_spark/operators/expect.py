"""Declarative data-quality expectations (the Deequ/Great-Expectations
surface) — constraint metrics computed in ONE pass over the table.

The reference validates rows one at a time during ingest
(pipeline.py's required-field drops; re-expressed as the one-pass
``df.observe`` filter in sources/launches.py:81). What it cannot do is
TABLE-level contracts: "o_orderkey is unique", "95% of prices in
range", "every order's customer exists". Production pipelines gate
loads on exactly these, and at 100 TB the only acceptable plan is one
shared scan emitting ALL metrics as a single aggregate row —
re-scanning per constraint multiplies cost by the constraint count.

Design:

- A check = (name, metric expression, pass predicate over the metric).
  All metric expressions ride ONE ``agg()`` — Catalyst evaluates them
  in a single whole-stage-codegen pass with map-side partial
  aggregation; distinct-style metrics expand inside the same shuffle.
- The aggregate row is unpivoted via ``stack`` into the
  (constraint, metric, passed) long form — post-agg, metadata-sized,
  the approved SinglePartition pattern.
- Referential integrity is its own check class (it needs a second
  table): a broadcast/shuffle LEFT join counted in one pass, unioned
  into the same output shape. The child table is scanned once.

Metrics are fractions-of-rows or ratios rounded to 6dp (float-parity
rule) so the audit itself is oracle-gradable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    metric: Column  # aggregate expression → DOUBLE
    passes: Column  # boolean over the aggregated metric


def completeness(col: str, at_least: float = 1.0) -> Check:
    """Fraction of rows with a non-NULL value."""
    m = F.round(F.avg(F.col(col).isNotNull().cast("double")), 6)
    return Check(f"completeness({col})", m, F.col("metric") >= at_least)


def uniqueness(col: str, at_least: float = 1.0) -> Check:
    """Distinct values / rows — 1.0 means a candidate key."""
    m = F.round(
        F.countDistinct(F.col(col)).cast("double")
        / F.count(F.lit(1)).cast("double"),
        6,
    )
    return Check(f"uniqueness({col})", m, F.col("metric") >= at_least)


def in_range(col: str, lo: float, hi: float, at_least: float = 1.0) -> Check:
    """Fraction of non-NULL values inside [lo, hi]."""
    ok = F.col(col).between(F.lit(lo), F.lit(hi)).cast("double")
    m = F.round(F.avg(ok), 6)  # avg ignores NULLs: completeness is its own check
    return Check(f"in_range({col})", m, F.col("metric") >= at_least)


def accepted_values(col: str, values: list[str], at_least: float = 1.0) -> Check:
    """Fraction of non-NULL values in the accepted set."""
    ok = F.col(col).isin(values).cast("double")
    m = F.round(F.avg(ok), 6)
    return Check(f"accepted_values({col})", m, F.col("metric") >= at_least)


def min_count(at_least: int) -> Check:
    """Table is at least this big (empty-load guard)."""
    m = F.count(F.lit(1)).cast("double")
    return Check("min_count", m, F.col("metric") >= float(at_least))


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate row-level checks in ONE aggregation pass; returns the
    (constraint, metric, passed) long form via a post-agg unpivot."""
    if not checks:
        raise ValueError("no checks given")
    agg = df.agg(*[c.metric.alias(f"m{i}") for i, c in enumerate(checks)])
    # names are interpolated into a SQL string literal — double any
    # single quote so a name derived from an exotic column name (e.g.
    # completeness(o'brien)) can't malform the stack() expression
    stack_args = ", ".join(
        "'{}', m{}".format(c.name.replace("'", "''"), i)
        for i, c in enumerate(checks)
    )
    long = agg.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (constraint, metric)"
        )
    )
    # pass predicates keyed by constraint name over the long form
    verdict = F.lit(None).cast("boolean")
    for c in checks:
        verdict = F.when(F.col("constraint") == c.name, c.passes).otherwise(
            verdict
        )
    return long.withColumn("passed", verdict)


def referential_integrity(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    at_least: float = 1.0,
    name: str | None = None,
) -> DataFrame:
    """Fraction of non-NULL child keys that exist in the parent —
    one LEFT join (AQE broadcasts a dimension-sized parent) + one
    aggregate row in the same (constraint, metric, passed) shape."""
    keys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    joined = child.select(F.col(child_col).alias("__ck")).join(
        keys, F.col("__ck") == F.col("__pk"), "left"
    )
    m = F.round(
        F.avg(
            F.when(F.col("__ck").isNotNull(), F.col("__pk").isNotNull().cast("double"))
        ),
        6,
    )
    cname = name or f"referential({child_col})"
    return (
        joined.agg(m.alias("metric"))
        .select(
            F.lit(cname).alias("constraint"),
            "metric",
            (F.col("metric") >= at_least).alias("passed"),
        )
    )

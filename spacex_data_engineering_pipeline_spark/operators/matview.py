"""Incremental materialized-view maintenance over parquet.

Keeps a grouped-aggregate view (COUNT / SUM / derived AVG) in sync
with a fact table by folding in batch deltas instead of re-scanning
the fact table — the capability that turns a 100 TB nightly
recompute into a batch-sized merge. Rows may carry a sign (+1 insert,
-1 retraction), so updates and deletes maintain exactly (the
DBSP / Materialize delta model restricted to abelian aggregates:
COUNT and SUM compose under +; AVG is derived at read; MIN/MAX are
NOT maintainable under retraction and are deliberately unsupported).

Scale shape:
- The view is stored partitioned by ``__bucket = pmod(xxhash64(keys),
  n_buckets)``. A delta batch first partially aggregates (map-side
  combine) to at most |distinct groups in batch| rows, then ONLY the
  bucket partitions containing those groups are read, merged
  (full-outer, null-safe on the group keys) and swap-rewritten via the
  same crash-safe two-rename protocol as
  ``operators/upsert.py::_swap_in_partitions``. Per-batch cost is
  O(|delta| + |touched buckets|), never O(view) — and never O(fact).
- Groups whose maintained row-count reaches zero are dropped; a bucket
  emptied entirely is removed (bucket partition values are integers,
  so the on-disk name is exactly ``__bucket=<int>`` — no
  escapePathName hazard; asserted).

Reference parity: the reference recomputes its aggregation snapshots
from the full table every run (src/aggregation_service.py — each
``get_*_metrics`` is a full-table scan); this operator is the
§2.11 north-star upgrade of that surface.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.upsert import (
    _repair_partition_swaps,
    _swap_in_partitions,
)

_BUCKET = "__bucket"
_ROWS = "__rows"


def _check_measures(measures: dict[str, tuple[str, str | None]]) -> None:
    for out, (kind, src) in measures.items():
        if kind not in ("count", "sum"):
            raise ValueError(
                f"measure {out!r}: kind {kind!r} not maintainable under "
                "retraction (only 'count' and 'sum' are abelian)"
            )
        if kind == "sum" and src is None:
            raise ValueError(f"measure {out!r}: sum needs a source column")


def _signed_agg(
    df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
    sign_col: str | None,
) -> DataFrame:
    """Partial-aggregate a (possibly signed) batch to one row per group:
    count → SUM(sign), sum(x) → SUM(sign*x). Runs map-side combine
    before any shuffle (plain groupBy + sum)."""
    sign = F.col(sign_col).cast("long") if sign_col else F.lit(1).cast("long")
    aggs = [F.sum(sign).alias(_ROWS)]
    for out, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.sum(sign).alias(out))
        else:
            aggs.append(F.sum(sign.cast("double") * F.col(src)).alias(out))
    return df.groupBy(*group_cols).agg(*aggs)


def _with_bucket(df: DataFrame, group_cols: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        _BUCKET, F.pmod(F.xxhash64(*group_cols), F.lit(n_buckets)).cast("int")
    )


def create_matview(
    spark: SparkSession,
    path: str,
    base_df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
    n_buckets: int = 16,
) -> None:
    """Materialize the initial view from ``base_df`` (all rows sign +1)."""
    _check_measures(measures)
    agg = _with_bucket(_signed_agg(base_df, group_cols, measures, None), group_cols, n_buckets)
    (
        agg.repartition(_BUCKET)
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(path)
    )


def apply_delta(
    spark: SparkSession,
    path: str,
    delta_df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
    sign_col: str | None = None,
    n_buckets: int = 16,
) -> dict:
    """Fold a delta batch into the stored view.

    ``sign_col`` (if given) holds +1/-1 per row; omitted means pure
    inserts. Returns {"touched_buckets": int, "dropped_buckets": int}.
    """
    _check_measures(measures)
    _repair_partition_swaps(path)

    delta_agg = _with_bucket(
        _signed_agg(delta_df, group_cols, measures, sign_col), group_cols, n_buckets
    ).persist()
    # metadata-sized probe: at most n_buckets values
    touched = [r[0] for r in delta_agg.select(_BUCKET).distinct().collect()]
    if not touched:
        delta_agg.unpersist()
        return {"touched_buckets": 0, "dropped_buckets": 0}
    assert all(isinstance(b, int) for b in touched)

    # partition-pruned read of ONLY the touched buckets
    view = spark.read.parquet(path).filter(F.col(_BUCKET).isin(touched))

    measure_cols = [_ROWS, *measures.keys()]
    cond = None
    for c in group_cols:
        e = view[c].eqNullSafe(delta_agg[c])
        cond = e if cond is None else (cond & e)
    merged = view.alias("v").join(delta_agg.alias("d"), cond, "full_outer").select(
        *[F.coalesce(F.col(f"v.{c}"), F.col(f"d.{c}")).alias(c) for c in group_cols],
        F.coalesce(F.col(f"v.{_BUCKET}"), F.col(f"d.{_BUCKET}")).alias(_BUCKET),
        *[
            (
                F.coalesce(F.col(f"v.{m}"), F.lit(0) if m == _ROWS else F.lit(0.0))
                + F.coalesce(F.col(f"d.{m}"), F.lit(0) if m == _ROWS else F.lit(0.0))
            ).alias(m)
            for m in measure_cols
        ],
    ).filter(F.col(_ROWS) != 0)

    # re-cast integral measures back to long (0.0 coalesce above only
    # applies to sum measures; counts stay long via the delta/view types)
    for out, (kind, _) in measures.items():
        if kind == "count":
            merged = merged.withColumn(out, F.col(out).cast("long"))
    merged = merged.withColumn(_ROWS, F.col(_ROWS).cast("long"))

    tmp = path.rstrip("/") + "._mv_stage"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        merged.repartition(_BUCKET)
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(tmp)
    )
    survivors = _swap_in_partitions(path, tmp, _BUCKET)
    # a touched bucket with no staged output lost ALL its groups —
    # integer partition values, so the f-string name IS the disk name
    dropped = 0
    for b in touched:
        name = f"{_BUCKET}={b}"
        if name not in survivors:
            gone = os.path.join(path, name)
            if os.path.exists(gone):
                shutil.rmtree(gone)
                dropped += 1
    shutil.rmtree(tmp, ignore_errors=True)
    delta_agg.unpersist()
    return {"touched_buckets": len(touched), "dropped_buckets": dropped}


def read_matview(
    spark: SparkSession,
    path: str,
    avg_of: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Read the view back (internal columns dropped). ``avg_of`` derives
    ratio measures at read time: out_col -> (sum_col, count_col)."""
    _repair_partition_swaps(path)
    df = spark.read.parquet(path)
    out = df.drop(_BUCKET, _ROWS)
    if avg_of:
        for out_col, (s, c) in avg_of.items():
            out = out.withColumn(out_col, F.col(s) / F.col(c))
    return out

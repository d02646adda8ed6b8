"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to all cores before a compute-heavy
    per-row stage. A small corpus arrives in 1-2 input splits, which
    would serialize an expensive map (signature computation, Arrow UDF)
    on one task; the round-robin shuffle moves only the raw rows (cheap
    relative to the map it parallelizes). No-op when the scan already
    has enough splits — at cluster scale it always does.

    Do NOT use upstream of a self-join: widening the input can replace
    AQE's broadcast choice with a shuffle join that costs more than the
    parallelism saves (measured in operators/dedup.py).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

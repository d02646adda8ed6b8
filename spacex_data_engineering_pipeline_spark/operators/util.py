"""Shared operator utilities."""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def release_caches_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie persisted intermediates' cache residency to the lifetime of
    the returned handle: when the caller drops its reference to
    ``result``, the intermediates are unpersisted (non-blocking).

    Operators persist() subtrees that feed multiple plan branches; a
    bare persist would leak those blocks for the whole session on
    repeated calls. Correctness never depends on the blocks (lineage is
    intact — an early release only costs recomputation), so releasing
    on GC of the handle is safe, and callers that keep the result
    around keep the cache warm.
    """

    def _release(dfs=cached):
        for d in dfs:
            try:
                d.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped — nothing to release

    weakref.finalize(result, _release)
    return result


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

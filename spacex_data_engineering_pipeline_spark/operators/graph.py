"""Iterative graph centrality: fixed-iteration PageRank over an edge
list, in integer fixed-point so every engine computes bit-identical
ranks (damped shares use INTEGRAL division — a double quotient could
round differently and flip a rank ordering).

Scale shape (the classic distributed PageRank): per iteration ONE
shuffle — contributions grouped by destination — plus a same-key join
of the rank table with the degree-annotated node table (AQE reuses the
exchange; both sides are node-cardinality, not edge-cardinality).
Iteration count is FIXED (the caller picks k), so the driver loop
builds a k-deep plan without data-dependent convergence probes; for
large k callers should localCheckpoint every few rounds like
``operators/dedup.py::connected_components`` does.

Dangling nodes (out-degree 0) don't occur in symmetric graphs — the
caller is expected to symmetrize directed inputs or accept that
dangling mass is dropped (documented PageRank-with-sink behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    init_micros: int = 1_000_000,
) -> DataFrame:
    """PageRank over ``edges(src, dst)`` for a fixed number of
    iterations. Ranks are int64 micro-units; each node's share to a
    neighbor is ``(rank * damping_pct) div (deg * 100)`` and the new
    rank is ``(100 - damping_pct) * init div 100 + Σ shares`` — all
    integral, engine-portable. Returns (node, rank_micros)."""
    base = (100 - damping_pct) * init_micros // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(init_micros).cast("long").alias("r"),
        "deg",
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr(f"(r * {damping_pct}L) div (deg * 100L)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["dst"], "left")
            .select(
                F.col("src").alias("node"),
                (F.lit(base).cast("long") + F.coalesce(F.col("s"), F.lit(0))).alias("r"),
                "deg",
            )
        )
    return ranks.select("node", F.col("r").alias("rank_micros"))

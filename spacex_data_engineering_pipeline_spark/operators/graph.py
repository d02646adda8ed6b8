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


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected graph given as
    canonical edges ``(src < dst)``, one row per edge. Returns a
    single row ``(n_nodes, n_edges, n_triangles)``.

    Algorithm: orient every edge low-id → high-id (the input contract)
    and enumerate wedges a→b→c with a<b<c via one self-join, then
    close them against the edge list with a second join — each
    triangle is counted exactly once. Cost is Σ deg⁺(v)² for the
    wedge join (the standard compact-forward bound), never |V|²; at
    100 TB the id-orientation is swapped for degree-orientation
    (direct each edge toward the higher-degree endpoint) which
    provably bounds Σ deg⁺² by O(|E|^1.5) on skewed graphs — id-
    orientation keeps the pipeline value-exact for engines that must
    replay it (the oracle's 3-way join), and the edge sets fed in
    here are already hub-free by construction (support-thresholded
    co-purchase pairs).
    """
    e = edges.select("src", "dst")
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tri = wedges.join(
        e.alias("e3"),
        (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")),
    )
    # the three scalars fold into ONE tagged union + global aggregate:
    # scalar-glue joins on literal keys get constant-folded by Catalyst
    # into nested-loop crosses, which the catalog-wide plan guard
    # rightly rejects — a union'd conditional aggregate has no join at
    # all and keeps the reduce metadata-sized
    null_v = F.lit(None).cast("long").alias("v")
    tagged = (
        tri.select(F.lit("t").alias("tag"), null_v)
        .unionAll(e.select(F.lit("e").alias("tag"), null_v))
        .unionAll(
            e.select(F.lit("n").alias("tag"), F.col("src").cast("long").alias("v"))
        )
        .unionAll(
            e.select(F.lit("n").alias("tag"), F.col("dst").cast("long").alias("v"))
        )
    )
    return tagged.agg(
        F.countDistinct(F.when(F.col("tag") == "n", F.col("v"))).alias("n_nodes"),
        F.count(F.when(F.col("tag") == "e", 1)).alias("n_edges"),
        F.count(F.when(F.col("tag") == "t", 1)).alias("n_triangles"),
    )

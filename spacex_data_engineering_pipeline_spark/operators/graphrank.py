"""Graph-centrality curation scores over similarity graphs.

Mutual-kNN edges (operators/similarity.py + the mutual join) give a
similarity graph; centrality over it is the standard representative-
selection signal (a high-centrality doc sits in the middle of a dense
semantic neighborhood — keep it, sample its satellites), the
graph-side complement to SemDeDup's keep-one-per-cluster.

Why INTEGER PageRank: the float update r' = (1−d)/N + d·Σ r_u/deg_u
sums contributions in engine-dependent order — a float rank could
never value-hash across Spark and DuckDB. Holding ranks in integer
RANK UNITS (a 10^12 budget split by integer division, damping as
·85 // 100) makes every step exact int64 arithmetic whose reductions
are order-free: the whole T-iteration program is a pure function of
the edge set, replayable in SQL iteration CTEs (the PCA-oracle
pattern, integer edition). Truncation remainders just leak a little
mass per step — fine for a CURATION SCORE (ordering signal), not a
probability; documented, deterministic, and graded.

Scale shape: per iteration ONE join of the rank vector to the edge
list on src (both keyed by node id — co-partitionable, AQE broadcasts
the rank side if small) + ONE groupBy(dst) integer sum with map-side
combine. T is fixed and small (centrality orderings stabilize in a
few steps on high-degree similarity graphs); lineage stays bounded via
localCheckpoint every few rounds exactly like connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # 10^12 rank units — deg ≤ 10^6 keeps r//deg exact-ish


def integer_pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    n_iter: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Deterministic integer PageRank over a DIRECTED edge list (pass
    both directions for an undirected/mutual graph).

    r0_v = RANK_SCALE // N for every node appearing in the edge list;
    each step: contribution c_u = (r_u · damping_pct // 100) // deg_u
    down every out-edge, then r'_v = base + Σ c_u with
    base = (RANK_SCALE // N · (100 − damping_pct)) // 100. All int64:
    |r| ≤ 10^12, ·85 ≤ 2^57, sums over in-edges ≤ N·r bounded by the
    total budget — exact at any aggregation order, which is the whole
    point. Output: (node, rank_q) with rank_q in rank units.

    Dangling nodes cannot exist in a mutual graph (in-degree =
    out-degree by construction); for general graphs their mass simply
    decays — acceptable for an ordering signal, documented.
    """
    # cut the upstream lineage ONCE: every iteration references the
    # edge list and the node set, and without this the whole producer
    # plan (e.g. the kNN-graph build) re-executes per reference —
    # measured 23.6 s → the build cost + 5 cheap rounds after the cut
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_q"))
    init = RANK_SCALE // n
    base = (init * (100 - damping_pct)) // 100
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src")

    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_q"))
    for it in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.expr(f"(rank_q * {damping_pct} div 100) div deg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank_q"),
            )
        )
        if (it + 1) % 3 == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

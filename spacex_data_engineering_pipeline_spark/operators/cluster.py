"""Distributed k-means over embedding columns — fixed-point, portable.

Semantic-dedup and corpus-curation pipelines (SemDeDup, DBSCAN-ish
pruning) start from exactly this primitive: assign every embedding to
its nearest centroid, then recompute centroids, iterated. The reference
has no vector surface at all; this is §2.11 north-star breadth.

Why fixed-point integers: float L2 distances are sums whose rounding
depends on accumulation order, so "nearest centroid" can FLIP between
engines (or between two Spark runs with different partition counts) for
near-tied vectors. Quantizing both sides to ``floor(x · 2^20)`` makes
every distance an exact int64 (|x| ≤ 2 ⇒ coordinate diff² ≤ ~1.8e13,
× 4096 dims still < 2^63), so the argmin — ties broken by lowest
centroid id — is bit-identical in Spark, numpy, and DuckDB. The same
trick that made the sign-LSH bucketing oracle-replayable
(operators/similarity.py).

Scale shape:

- **Assignment is embarrassingly parallel.** Centroids (k × dim, a few
  MB even at k=65k·dim=1k) ride into every task as a numpy literal via
  an Arrow-batched ``mapInPandas`` — one pass over the vectors, no
  shuffle, no driver round-trip per row. The (vectors × centroids)
  distance matrix is one integer matmul per Arrow batch (numpy int64
  matmuls are exact — no BLAS float path).
- **The update step is one map-side-combined groupBy.** Per-cluster
  coordinate sums aggregate as fixed-width arrays (``F.posexplode`` →
  (cluster, dim_index) partial sums), so the shuffle carries k·dim
  rows, not n·dim.
- Lloyd iterations loop OUTSIDE Spark (driver collects k·dim sums —
  bounded by model size, the documented probe class), each iteration
  one job. That matches how MLlib's own KMeans drives it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

QUANT = 1 << 20  # fixed-point scale, shared with the sign-LSH path


def quantize_vec(x: list[float]) -> list[int]:
    import math

    return [int(math.floor(v * QUANT)) for v in x]


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    centroid_ids: list[int] | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by EXACT quantized
    L2 distance; ties go to the lowest centroid ID.

    ``centroid_ids`` names each centroid (default: positional 0..k-1).
    Passing the REAL source ids (e.g. the vec_id each centroid was
    collected from) makes the cluster labels robust to gaps in the id
    space instead of coincidentally aligned with list position; the
    pairs are sorted by id internally so the argmin-first tie-break is
    always "lowest centroid id", whatever order the caller passed.

    NULL-vector contract matches the rest of the vector surface
    (cosine/near-dup paths): rows with a NULL vector are FILTERED, not
    crashed on — callers that need them must handle NULLs upstream.

    Returns (id, cluster, qdist) where qdist is the integer squared
    distance in quantized units. One narrow Arrow pass — the plan is
    scan → filter → mapInPandas, nothing else — so it composes with
    partition pruning and column pruning upstream.
    """
    if centroid_ids is None:
        centroid_ids = list(range(len(centroids)))
    if len(centroid_ids) != len(centroids):
        raise ValueError("centroid_ids and centroids must align")
    return kmeans_assign_q(
        df, id_col, vec_col, [quantize_vec(c) for c in centroids], centroid_ids
    )


def kmeans_assign_q(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids_q: list[list[int]],
    centroid_ids: list[int],
) -> DataFrame:
    """:func:`kmeans_assign` for centroids ALREADY in quantized integer
    space — the Lloyd-iteration form, where each round's centroids are
    exact integer floor-means of quantized sums and never round-trip
    through floats (a float round-trip could flip a near-tied argmin
    between engines)."""
    import numpy as np

    if len(centroid_ids) != len(centroids_q):
        raise ValueError("centroid_ids and centroids_q must align")
    order = sorted(range(len(centroids_q)), key=lambda i: centroid_ids[i])
    cid = np.asarray([centroid_ids[i] for i in order], dtype=np.int64)
    cq = np.asarray([centroids_q[i] for i in order], dtype=np.int64)
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("cluster", LongType(), False),
            StructField("qdist", LongType(), False),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vq = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * QUANT
            ).astype(np.int64)
            d = (
                (vq * vq).sum(axis=1, keepdims=True)
                - 2 * (vq @ cq.T)
                + (cq * cq).sum(axis=1)[None, :]
            )
            cluster = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cid[cluster],
                    "qdist": d[np.arange(len(cluster)), cluster],
                }
            )

    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(assign, out_schema)
    )


def kcenter_greedy(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, list[int], int]]:
    """Greedy k-center coreset selection (Gonzalez 1985 2-approximation
    — the farthest-point traversal behind diversity-aware corpus
    curation / active-learning coresets): seed with the lowest id,
    then k−1 rounds of "pick the vector farthest from everything
    chosen so far", ties → lowest id.

    Distributed shape mirrors ``kmeans_fit``: the chosen set is MODEL
    state (k × dim, driver-held); each round is ONE zero-shuffle Arrow
    pass (``kmeans_assign_q`` — its qdist against the chosen set IS
    the min-distance-to-coreset) followed by a TakeOrdered(1) argmax
    and a single-row vector fetch — both the documented bounded-probe
    class, 2 probes × k rounds total. All distances are exact int64 in
    quantized space, so the selection sequence is a pure function of
    the data, replayable bit-for-bit by the DuckDB oracle's unrolled
    LEAST chain.

    Returns ``[(vec_id, quantized_vec, sel_dist_q)]`` in selection
    order; the seed's sel_dist_q is 0 by convention (chosen against an
    empty set).
    """
    vecs = df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    seed = vecs.orderBy(id_col).first()
    if seed is None:
        return []
    chosen: list[tuple[int, list[int], int]] = [
        (seed[id_col], quantize_vec(list(seed[vec_col])), 0)
    ]
    for _ in range(1, k):
        ids = [c[0] for c in chosen]
        qs = [c[1] for c in chosen]
        far = (
            kmeans_assign_q(vecs, id_col, vec_col, qs, ids)
            .orderBy(F.col("qdist").desc(), F.col(id_col).asc())
            .limit(1)
            .first()
        )
        if far is None or far["qdist"] == 0:
            break  # all remaining vectors coincide with a chosen one
        row = vecs.filter(F.col(id_col) == far[id_col]).first()
        chosen.append(
            (far[id_col], quantize_vec(list(row[vec_col])), far["qdist"])
        )
    return chosen


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    init_centroids: list[list[float]],
    centroid_ids: list[int] | None = None,
    max_iters: int = 20,
) -> tuple[DataFrame, dict[int, list[int]], int]:
    """Full Lloyd iteration to a FIXED POINT, entirely in quantized
    integer space so every round — and therefore the converged model —
    is a pure function of (data, init), replayable bit-for-bit by any
    engine with 64-bit integers:

    - assignment: exact int64 L2 argmin, ties → lowest centroid id
      (zero-shuffle Arrow pass per round);
    - update: per-(cluster, coordinate) integer sums via the map-side-
      combined posexplode groupBy — the shuffle carries k·dim rows per
      round regardless of corpus size;
    - new centroid: FLOOR division qsum // n (numpy ``//`` and DuckDB
      ``//`` both floor, so negatives agree); an empty cluster keeps
      its previous centroid;
    - convergence: centroids unchanged between rounds (integer
      equality — no epsilon), or ``max_iters``.

    The driver holds only model-sized state (k·dim ints per round, the
    documented probe class) and coordinates the loop exactly as
    MLlib's KMeans does; each round is one Spark job over the
    persisted input. Returns (final assignment DataFrame, final
    centroids {cid: quantized ints}, rounds run).
    """
    if centroid_ids is None:
        centroid_ids = list(range(len(init_centroids)))
    cents: dict[int, list[int]] = {
        cid: quantize_vec(c) for cid, c in zip(centroid_ids, init_centroids)
    }
    data = df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    data = data.persist()
    iters = 0
    try:
        for _ in range(max_iters):
            ids = sorted(cents)
            assigned = kmeans_assign_q(
                data, id_col, vec_col, [cents[i] for i in ids], ids
            )
            sums = cluster_coordinate_sums(assigned, data, id_col, vec_col)
            rows = sums.collect()  # k*dim rows: model-sized driver probe
            iters += 1
            new_cents = {cid: list(q) for cid, q in cents.items()}
            per_cluster: dict[int, list[tuple[int, int, int]]] = {}
            for r in rows:
                per_cluster.setdefault(r["cluster"], []).append(
                    (r["j"], r["qsum"], r["n"])
                )
            for cid, triples in per_cluster.items():
                vec = new_cents[cid]
                for j, qsum, n in triples:
                    vec[j] = qsum // n  # floor division: portable
            if new_cents == cents:
                break
            cents = new_cents
        ids = sorted(cents)
        final = kmeans_assign_q(
            data, id_col, vec_col, [cents[i] for i in ids], ids
        )
        return final, cents, iters
    finally:
        data.unpersist()


def cluster_coordinate_sums(
    assigned: DataFrame, df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """The Lloyd update's shuffle stage: per-(cluster, coordinate)
    exact quantized sums + member counts.

    posexplode turns each vector into (cluster, j, qx) rows; the
    groupBy's map-side combine collapses them to k·dim partials per
    task, so the shuffle is model-sized, not data-sized. The driver
    (or a final agg) divides sums by counts to produce new centroids.
    """
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x * F.lit(float(QUANT))).cast("long")
    )
    joined = df.select(id_col, q.alias("__q")).join(
        assigned.select(id_col, "cluster"), [id_col]
    )
    return (
        joined.select("cluster", F.posexplode("__q").alias("j", "qx"))
        .groupBy("cluster", "j")
        .agg(
            F.sum("qx").alias("qsum"),
            F.count(F.lit(1)).alias("n"),
        )
    )

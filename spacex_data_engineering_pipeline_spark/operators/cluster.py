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
    import numpy as np

    if centroid_ids is None:
        centroid_ids = list(range(len(centroids)))
    if len(centroid_ids) != len(centroids):
        raise ValueError("centroid_ids and centroids must align")
    order = sorted(range(len(centroids)), key=lambda i: centroid_ids[i])
    cid = np.asarray([centroid_ids[i] for i in order], dtype=np.int64)
    cq = np.asarray(
        [quantize_vec(centroids[i]) for i in order], dtype=np.int64
    )
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
            # ||v-c||² = ||v||² - 2v·c + ||c||²; the cross term is one
            # exact int64 matmul (n × dim) @ (dim × k)
            d = (
                (vq * vq).sum(axis=1, keepdims=True)
                - 2 * (vq @ cq.T)
                + (cq * cq).sum(axis=1)[None, :]
            )
            cluster = d.argmin(axis=1)  # argmin takes the FIRST minimum: low id wins ties
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

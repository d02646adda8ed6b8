"""Distributed exact linear algebra over embedding columns.

The Gram matrix G = Σ_rows v·vᵀ is the building block PCA, whitening,
ridge regression, and linear-probe evaluation all start from: compute
G (and the mean) once over the corpus, then do the O(dim³) eigen/solve
work on the driver — dim×dim is model-sized no matter the corpus.

Why fixed-point: float Gram sums are order-dependent (different
partitionings → different last bits → a downstream eigensolver can
flip near-tied components), so like the k-means tier
(operators/cluster.py) both factors quantize to ``floor(x · 2^20)``
int64 and every cell is an EXACT integer — bit-identical in Spark,
numpy, and DuckDB, which is what makes the distributed reduction
oracle-gradable at all.

Scale shape: each Arrow batch contributes one dim×dim integer matmul
(numpy int64 — exact, no BLAS float path) and emits the upper
triangle (dim·(dim+1)/2 cells); the shuffle then carries
batches × triangle rows and the final map-side-combined SUM yields
the triangle once. Overflow budget: |q| ≤ 2^21 ⇒ a cell's total fits
int64 while n_rows < 2^20 ≈ 1M (per-batch partials are safe far
beyond that); past it, swap the final SUM to DECIMAL(38,0) — only
triangle-many rows pay the decimal tax, the matmuls stay int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.cluster import QUANT


def quantized_gram(df: DataFrame, vec_col: str) -> DataFrame:
    """Exact upper-triangle Gram matrix of the quantized vectors.

    Returns (i, j, gram_q) with 1-based i ≤ j (matching SQL list
    indexing), gram_q = Σ_rows q[i]·q[j] where q = floor(v·2^20),
    an exact int64 reduction. NULL vectors are excluded (the
    vector-surface NULL contract).
    """

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Q = np.floor(M * QUANT).astype(np.int64)
            G = Q.T @ Q
            iu = np.triu_indices(G.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int32),
                    "j": (iu[1] + 1).astype(np.int32),
                    "g": G[iu],
                }
            )

    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(part, "i int, j int, g long")
    )
    return parts.groupBy("i", "j").agg(F.sum("g").alias("gram_q"))


def quantized_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """ONE corpus pass emitting every exact integer moment a
    driver-side covariance/PCA fit needs, keyed like the Gram triangle:

    - (0, 0)      → row count
    - (i, 0)      → Σ_rows q[i]           (first moment, 1-based i)
    - (i, j) i≤j  → Σ_rows q[i]·q[j]      (second moment / Gram)

    with q = floor(v·2^20) int64, so every cell is an exact integer —
    bit-identical across Spark, numpy, and DuckDB regardless of
    partitioning. The result is model-sized (1 + dim + dim·(dim+1)/2
    rows ≈ 2145 at dim=64): collecting it is the same class of probe
    as the k-means centroid sums, and the O(dim³) eigensolve it feeds
    stays on the driver. Covariance then derives as
    C[i][j] = (G[ij] − s_i·s_j/N)/N in deterministic IEEE doubles.
    """

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Q = np.floor(M * QUANT).astype(np.int64)
            G = Q.T @ Q
            iu = np.triu_indices(G.shape[0])
            s = Q.sum(axis=0)
            dim = G.shape[0]
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [[0], np.arange(1, dim + 1), (iu[0] + 1)]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [[0], np.zeros(dim, np.int64), (iu[1] + 1)]
                    ).astype(np.int32),
                    "g": np.concatenate([[len(pdf)], s, G[iu]]),
                }
            )

    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(part, "i int, j int, g long")
    )
    return parts.groupBy("i", "j").agg(F.sum("g").alias("m"))

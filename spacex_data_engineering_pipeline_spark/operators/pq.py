"""Product quantization (PQ) for embedding columns.

At 100 TB, the embedding column IS the storage bill: 64-dim float32 is
256 bytes/row, and similarity scans are bandwidth-bound on it. PQ
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011) compresses each vector to ``n_subq`` one-byte codes —
32× smaller at 8 codes — by quantizing each contiguous dimension chunk
against its own small codebook, and scores candidates WITHOUT
decompression via asymmetric distance computation (ADC): per query,
precompute a tiny lookup table of query-chunk↔centroid distances, then
a vector's approximate distance is ``n_subq`` table lookups.

Spark shape mirrors the IVF design in ``similarity.py``: codebooks are
trained driver-side on a bounded sample (coarse quantizers need rough
centroids, not convergence), encoding is ONE Arrow-batched map pass
over the corpus (scan speed, no shuffle), and the scored top-k is
``TakeOrderedAndProject``. Codes are deterministic given the seed.

No SQL oracle — k-means centroids are float-iteration artifacts — so
the contract is pytest-gated instead: codes are structurally valid,
seeded builds are reproducible, and ADC top-k recall against exact L2
ranking clears a floor on the real embeddings table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lloyd_kmeans(X: np.ndarray, k: int, seed: int, n_iter: int = 10) -> np.ndarray:
    """Plain seeded L2 Lloyd iteration on a driver-side sample; dead
    centroids reseed to random points. Returns (k, dim) centroids."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)].astype("float64")
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for c in range(k):
            members = X[labels == c]
            centers[c] = members.mean(axis=0) if len(members) else X[rng.integers(len(X))]
    return centers


class PqIndex:
    """Handle over the encoded corpus: ``codes`` is (id, code[array<int>])
    — ``n_subq`` small ints per row instead of ``dim`` floats — plus the
    driver-side codebook tensor (n_subq, n_centroids, sub_dim)."""

    def __init__(self, codes: DataFrame, codebooks: np.ndarray, id_col: str):
        self.codes = codes
        self.codebooks = codebooks
        self.id_col = id_col

    def unpersist(self) -> None:
        self.codes.unpersist()


def build_pq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_subq: int = 8,
    n_centroids: int = 16,
    seed: int = 42,
    sample_cap: int = 65536,
    persist: bool = True,
) -> PqIndex:
    """Train per-chunk codebooks on a bounded driver sample, then encode
    the whole corpus in one Arrow-batched map pass (the only
    corpus-wide work — scan speed, no shuffle; at scale the codes table
    is written once and reused by every query)."""
    from spacex_data_engineering_pipeline_spark.operators.util import (
        deterministic_sample_vectors,
    )

    sample_rows = deterministic_sample_vectors(df, id_col, vec_col, sample_cap)
    if not sample_rows:
        raise ValueError("cannot train PQ codebooks over an empty corpus")
    X = np.asarray(sample_rows, dtype="float64")
    dim = X.shape[1]
    if dim % n_subq != 0:
        raise ValueError(f"dim ({dim}) must divide evenly into n_subq ({n_subq}) chunks")
    sub = dim // n_subq
    codebooks = np.stack(
        [
            _lloyd_kmeans(X[:, s * sub : (s + 1) * sub], n_centroids, seed + s)
            for s in range(n_subq)
        ]
    )

    @F.pandas_udf("array<int>")
    def _encode(batch: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype="float64") for v in batch])
        if M.size == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((len(M), n_subq), dtype="int32")
        for s in range(n_subq):
            chunk = M[:, s * sub : (s + 1) * sub]
            # ||x-c||² = ||x||² + ||c||² - 2x·c ; ||x||² is rank-constant
            d2 = (codebooks[s] ** 2).sum(axis=1)[None, :] - 2.0 * chunk @ codebooks[s].T
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    codes = df.select(F.col(id_col), _encode(F.col(vec_col)).alias("code"))
    if persist:
        codes = codes.persist()
    return PqIndex(codes, codebooks, id_col)


def pq_topk(index: PqIndex, query_vec: list[float], k: int = 10) -> DataFrame:
    """ADC top-k: nearest codes to the query by approximate squared L2.
    The per-query LUT (n_subq × n_centroids distances) is computed once
    driver-side and closed over the scoring UDF; each row costs
    ``n_subq`` lookups — the corpus's float vectors are never read.
    Returns (id, approx_dist2) ascending; plan is a narrow map +
    TakeOrderedAndProject."""
    q = np.asarray(query_vec, dtype="float64")
    n_subq, _, sub = index.codebooks.shape
    lut = np.stack(
        [
            ((index.codebooks[s] - q[s * sub : (s + 1) * sub]) ** 2).sum(axis=1)
            for s in range(n_subq)
        ]
    )
    sub_idx = np.arange(n_subq)

    @F.pandas_udf("double")
    def _adc(batch: pd.Series) -> pd.Series:
        C = np.asarray([np.asarray(c, dtype="int64") for c in batch])
        if C.size == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(lut[sub_idx, C].sum(axis=1))

    return (
        index.codes.select(index.id_col, _adc(F.col("code")).alias("approx_dist2"))
        .orderBy(F.col("approx_dist2").asc(), F.col(index.id_col).asc())
        .limit(k)
    )


def pq_topk_rerank(
    index: PqIndex,
    vectors: DataFrame,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    shortlist_factor: int = 4,
) -> DataFrame:
    """Two-stage search, the production PQ pattern: ADC over the codes
    picks a ``k·shortlist_factor`` shortlist (floats never read), then
    the float vectors of ONLY the shortlisted rows are fetched and
    exact-ranked. The corpus-wide pass stays on the 32×-smaller codes;
    the expensive column is read for ~tens of rows — which is why ADC
    ranking noise (quantization error) stops mattering: the shortlist
    just has to CONTAIN the true top-k, not order it.
    Returns (id, dist2) ascending by exact squared L2.
    """
    q = np.asarray(query_vec, dtype="float64")
    shortlist = pq_topk(index, query_vec, k=k * shortlist_factor).select(index.id_col)

    @F.pandas_udf("double")
    def _exact_d2(batch: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype="float64") for v in batch])
        if M.size == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(((M - q) ** 2).sum(axis=1))

    return (
        vectors.join(F.broadcast(shortlist), index.id_col, "left_semi")
        .select(index.id_col, _exact_d2(F.col(vec_col)).alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col(index.id_col).asc())
        .limit(k)
    )

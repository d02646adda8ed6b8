"""Exact-replay PCA / low-rank projection over embedding columns.

An eigensolve has no native SQL, which is why this tier was deferred —
the oracle policy pins the no-oracle exemption set empty. The unlock:
make every arithmetic step a DETERMINISTIC IEEE op evaluated in the
same order on both engines, and the whole pipeline (moments →
covariance → power iteration with deflation → projection) becomes a
pure function of the data that DuckDB can replay bit for bit:

1. MOMENTS are exact integers: q = floor(v·2^20) int64 (the k-means /
   Gram convention, operators/linalg.py), N, s_i = Σ q_i,
   G_ij = Σ q_i·q_j — order-independent reductions, the only
   corpus-sized work (ONE Arrow pass, model-sized output).
2. COVARIANCE C_ij = (double(G_ij) − double(s_i)·double(s_j)/N)/N with
   this exact parenthesization — each step one IEEE double op on
   identical inputs, so identical bits in numpy and SQL.
3. POWER ITERATION with deflation on the dim×dim C, fixed start
   v0 = 1/sqrt(dim), fixed iteration count: every matvec row is a
   STRICT left-to-right dot (np.cumsum — the same order as DuckDB's
   ``list_dot_product``), norms/divisions elementwise IEEE. No BLAS in
   the fit path: reassociated sums would drift the last ulp and the
   oracle hashes the projections. Fixed iterations ≠ convergence —
   the contract is "the deterministic T-step estimate", which both
   engines compute identically (quality is pytest-pinned separately
   against numpy's true eigensolve).
4. PROJECTION pc_c = ⟨q − mean, v_c⟩/2^20 per row — corpus-sized but a
   narrow map (zip_with + left-to-right aggregate fold, JVM-side), the
   sampled-train/full-assign split of the k-means tier: the fit cost
   is O(dim²) per batch + a model-sized collect; the assign cost is
   scan speed at any corpus size.

At 100 TB: the moments pass is the Gram scale story (dim×dim int
matmul per Arrow batch, triangle-sized shuffle); the eigensolve is
O(dim³) driver-side on 2145 numbers; the projection is one
whole-stage-codegen map. Nothing corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.cluster import QUANT
from spacex_data_engineering_pipeline_spark.operators.linalg import (
    quantized_moments,
)


def _strict_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Strict left-to-right Σ a_i·b_i — np.cumsum is DEFINED as the
    running sum, i.e. the exact evaluation order of DuckDB's
    ``list_dot_product`` and the zip_with/aggregate fold."""
    return float(np.cumsum(a * b)[-1])


class PcaModel:
    """Driver-side PCA state: the quantized-domain mean (dim doubles)
    and ``n_components`` unit eigenvector estimates with their Rayleigh
    eigenvalues — KiB-scale, the same class as k-means centroids."""

    def __init__(self, mean, basis, eigvals, n_rows: int, n_iter: int):
        self.mean = np.asarray(mean, dtype="float64")
        self.basis = [np.asarray(v, dtype="float64") for v in basis]
        self.eigvals = [float(x) for x in eigvals]
        self.n_rows = n_rows
        self.n_iter = n_iter


def merge_moments(a: DataFrame, b: DataFrame) -> DataFrame:
    """Integer moment ADDITIVITY — the incremental-PCA theorem: every
    cell of ``quantized_moments`` is an order-free int64 sum over rows,
    so for DISJOINT row sets moments(A ∪ B) = moments(A) + moments(B)
    EXACTLY — not approximately, bit for bit. A production fit
    therefore persists the 2,145-row moment table once, folds each
    arriving batch in with this one model-sized groupBy, and re-runs
    only the O(dim³) driver-side eigensolve — the corpus is never
    rescanned, and the refit model is IDENTICAL to a from-scratch fit
    over the union (graded by ``embedding_pca_incremental``).
    """
    return (
        a.select("i", "j", "m")
        .unionByName(b.select("i", "j", "m"))
        .groupBy("i", "j")
        .agg(F.sum("m").alias("m"))
    )


def fit_pca_from_moments(
    rows, n_components: int, n_iter: int = 12
) -> PcaModel:
    """Driver-side fit from collected moment rows (i, j, m) — the
    deterministic program ``fit_pca`` runs after its corpus pass,
    split out so merged/persisted moments (``merge_moments``) feed the
    identical arithmetic."""
    n = 0
    s_map: dict[int, int] = {}
    g_map: dict[tuple[int, int], int] = {}
    for r in rows:
        i, j, m = int(r["i"]), int(r["j"]), int(r["m"])
        if i == 0:
            n = m
        elif j == 0:
            s_map[i] = m
        else:
            g_map[(i, j)] = m
    if n == 0:
        raise ValueError("cannot fit PCA over an empty corpus")
    dim = max(s_map)
    s = np.array([s_map[i] for i in range(1, dim + 1)], dtype="float64")
    G = np.zeros((dim, dim), dtype="float64")
    for (i, j), g in g_map.items():
        G[i - 1, j - 1] = g
        G[j - 1, i - 1] = g
    nf = float(n)
    # C_ij = (G_ij − (s_i·s_j)/N)/N — elementwise IEEE, the exact
    # parenthesization the oracle replays
    C = (G - (s[:, None] * s[None, :]) / nf) / nf
    mean = s / nf

    basis, eigvals = [], []
    for _ in range(n_components):
        v = np.full(dim, 1.0 / math.sqrt(float(dim)))
        for _ in range(n_iter):
            w = np.array([_strict_dot(C[i], v) for i in range(dim)])
            nrm = math.sqrt(_strict_dot(w, w))
            if nrm == 0.0:
                raise ValueError(
                    "degenerate covariance: power iterate vanished "
                    "(constant corpus or components > rank)"
                )
            v = w / nrm
        w = np.array([_strict_dot(C[i], v) for i in range(dim)])
        lam = _strict_dot(v, w)
        # The zero-iterate guard above only catches an EXACT zero: on a
        # rank-deficient corpus a deflated component's Rayleigh estimate
        # can be ~0 or slightly negative float residue, and whitening
        # divides by sqrt(λ̂) — fail fast here instead of emitting
        # NaN/inf whitened columns (and a diverging oracle) later.
        # The floor is RELATIVE to the leading eigenvalue so a full-rank
        # corpus of tiny-magnitude vectors (all true eigenvalues small
        # but proportionate) still fits; only deflation residue — many
        # orders below λ₁ — trips it.
        # The FIRST component gets a scale-aware floor of its own: on a
        # near-constant corpus the int64 moments cancel through float64
        # (entries above 2^53), leaving a λ̂₁ that is pure rounding
        # residue — relative floors downstream would then scale off
        # junk and whitening would divide by √residue. Residue from
        # the G/n − (s/n)² cancellation is bounded by ~eps·|G|/n², so
        # a λ̂₁ below 1e-12 of that moment scale (10⁴ × eps headroom)
        # is noise, not signal; a genuine corpus only trips this if
        # its std/mean ratio is below 1e-6, i.e. variance itself
        # underflowed the float64 mantissa of the moments.
        if eigvals:
            floor = 1e-9 * eigvals[0]
        else:
            moment_scale = max(float(np.abs(G).max()) / (nf * nf), 5e-324)
            floor = 1e-12 * moment_scale
        if lam <= floor:
            raise ValueError(
                f"eigenvalue estimate {lam!r} for component {len(basis) + 1} "
                "is not positive: corpus rank < n_components (deflation "
                "residue) — reduce n_components"
            )
        basis.append(v)
        eigvals.append(lam)
        # deflate: C_ij −= (λ·v_i)·v_j — same parenthesization as SQL
        C = C - (lam * v)[:, None] * v[None, :]
    return PcaModel(mean, basis, eigvals, n, n_iter)


def fit_pca(df: DataFrame, vec_col: str, n_components: int, n_iter: int = 12) -> PcaModel:
    """Fit the deterministic power-iteration PCA model.

    One corpus pass (``quantized_moments``) collects N, s, G as exact
    int64; the covariance build and the T-step power iteration with
    deflation run driver-side in strict-order float — every op
    replayable by the SQL oracle. Degenerate corpora (a zero iterate
    or a non-positive deflated eigenvalue estimate) fail fast rather
    than emit NaN bases.
    """
    return fit_pca_from_moments(
        quantized_moments(df, vec_col).collect(), n_components, n_iter
    )


def _lit_double_array(vals) -> Column:
    """A double-array literal as ONE foldable expression: repr() emits
    the shortest decimal that round-trips, and string→double cast is
    correctly rounded in both engines, so the literal carries the exact
    driver bits — without the F.lit(list) CreateArray-per-element plan
    blowup (the bloomjoin lesson)."""
    return F.split(
        F.lit(",".join(repr(float(v)) for v in vals)), ","
    ).cast("array<double>")


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: PcaModel,
    decimals: int = 6,
    whiten: bool = False,
) -> DataFrame:
    """Project every vector onto the model's components:
    pc_c = ⟨floor(v·2^20) − mean, basis_c⟩ / 2^20 (the /2^20 returns to
    data units — exact, a power-of-two divide), rounded at ``decimals``.
    With ``whiten=True`` each component is additionally divided by
    sqrt(λ̂_c·)/2^20 — unit variance per retained direction, the input
    contract of cosine-on-whitened / Mahalanobis-style downstream
    scoring. The divide order is pinned ((proj/2^20)/sqrt(λ̂)/…) so the
    oracle replays the same IEEE sequence; λ̂ > 0 is guaranteed by the
    fit's degenerate guard.

    Pure Column expressions — zip_with + left-to-right aggregate folds
    identical to ``list_dot_product``'s order, whole plan a narrow map:
    scan-speed at any corpus size, no UDF, no shuffle. NULL vectors
    project to NULL components.
    """
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(QUANT))).cast("double"),
    )
    centered = F.zip_with(q, _lit_double_array(model.mean), lambda a, b: a - b)
    cols = [F.col(id_col)]
    for c, v in enumerate(model.basis, start=1):
        proj = F.aggregate(
            F.zip_with(centered, _lit_double_array(v), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = proj / F.lit(float(QUANT))
        name = f"pc{c}"
        if whiten:
            # λ̂ is in quantized-domain units (2^40 × data-domain): the
            # data-domain std of pc_c is sqrt(λ̂)/2^20, and pc_c is
            # already data-domain — so divide by (sqrt(λ̂)/2^20)
            out = out / (
                F.sqrt(F.lit(model.eigvals[c - 1])) / F.lit(float(QUANT))
            )
            name = f"wpc{c}"
        cols.append(F.round(out, decimals).alias(name))
    return df.select(*cols)

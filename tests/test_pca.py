"""PCA tier (operators/pca.py): fit quality against numpy's true
eigensolve, fit/project variance agreement, layout invariance, and
the degenerate-corpus guards. Bit-exactness vs the DuckDB replay is
graded by the catalog oracle (embedding_pca_project)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.catalog import load_table
from spacex_data_engineering_pipeline_spark.operators.cluster import QUANT
from spacex_data_engineering_pipeline_spark.operators.pca import (
    fit_pca,
    pca_project,
)


def _numpy_cov(emb_rows):
    Q = np.floor(np.asarray(emb_rows, dtype="float64") * QUANT)
    mean = Q.mean(axis=0)
    X = Q - mean
    return (X.T @ X) / len(Q), mean


def test_pca_rayleigh_vs_true_eigensolve(spark, sf_dir):
    """12 power steps must capture most of the top eigenvalue: the
    Rayleigh quotient is monotone nondecreasing in the iteration, so
    λ̂1 ≤ λ1 always, and on real data it should be ≥ 0.9·λ1 — a fit
    that stalls below that is broken, not just unconverged."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    model = fit_pca(emb, "embedding", n_components=2, n_iter=12)
    rows = [r["embedding"] for r in emb.select("embedding").collect()]
    C, mean_np = _numpy_cov(rows)
    true_eigs = np.sort(np.linalg.eigvalsh(C))[::-1]
    assert model.eigvals[0] <= true_eigs[0] * (1 + 1e-9)
    assert model.eigvals[0] >= 0.9 * true_eigs[0], (
        model.eigvals,
        true_eigs[:3],
    )
    # the mean is exact (integer sums / N)
    assert np.allclose(model.mean, mean_np, rtol=0, atol=1e-6)
    # unit bases, near-orthogonal after deflation
    for v in model.basis:
        assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-12)
    # random-ish test embeddings have a thin spectral gap, so 12 power
    # steps leave a small residual angle — pin "near", not "exactly"
    assert abs(float(model.basis[0] @ model.basis[1])) < 0.1


def test_pca_projection_variance_matches_eigval(spark, sf_dir):
    """var(pc1) over the corpus must equal v1ᵀCv1/2^40 = λ̂1/2^40 (the
    projection is ⟨q−mean, v⟩/2^20): the corpus-side projection and
    the driver-side fit agree on the model they share."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    model = fit_pca(emb, "embedding", n_components=1, n_iter=12)
    proj = pca_project(emb, "vec_id", "embedding", model, decimals=9)
    stats = proj.agg(
        F.avg("pc1").alias("mu"), F.avg(F.col("pc1") * F.col("pc1")).alias("m2")
    ).first()
    var = stats["m2"] - stats["mu"] ** 2
    expect = model.eigvals[0] / float(QUANT) ** 2
    assert math.isclose(var, expect, rel_tol=1e-4), (var, expect)
    # centered projections: the mean of pc1 is ~0 by construction
    assert abs(stats["mu"]) < 1e-3 * math.sqrt(expect)


def test_pca_layout_invariance(spark, sf_dir):
    """Fit + projection are pure functions of the data: a hostile
    repartition(64) (different Arrow batches, different reduce order)
    yields bit-identical moments, hence bit-identical projections."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    m1 = fit_pca(emb, "embedding", n_components=2, n_iter=12)
    m2 = fit_pca(emb.repartition(64), "embedding", n_components=2, n_iter=12)
    assert [list(v) for v in m1.basis] == [list(v) for v in m2.basis]
    assert m1.eigvals == m2.eigvals
    p1 = [tuple(r) for r in pca_project(emb, "vec_id", "embedding", m1)
          .orderBy("vec_id").collect()]
    p2 = [tuple(r) for r in pca_project(emb.repartition(64), "vec_id",
                                        "embedding", m2)
          .orderBy("vec_id").collect()]
    assert p1 == p2


def test_pca_degenerate_corpora(spark):
    """Empty corpus and constant corpus (zero covariance) fail fast
    with a diagnosable error instead of emitting NaN bases."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_pca(empty, "embedding", n_components=1)
    const = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="degenerate"):
        fit_pca(const, "embedding", n_components=1)
    # rank-deficient: 2 distinct rows span rank ≤ 1 after centering, so
    # component 2's deflated Rayleigh estimate is ~0/negative residue —
    # the eigenvalue floor must refuse rather than whiten into NaN/inf
    rank1 = spark.createDataFrame(
        [(i, [float(i % 2), 2.0 * float(i % 2), 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not positive|degenerate"):
        fit_pca(rank1, "embedding", n_components=3)


def test_pca_tiny_but_proportionate_spectrum_fits():
    """The eigenvalue floor is RELATIVE to λ̂1: a full-rank corpus whose
    true eigenvalues are all tiny (here ~1e-10 — below the former
    absolute 1e-9 floor) but proportionate must fit; only deflation
    residue orders of magnitude below λ̂1 may refuse. Moments: n = 1e10
    rows of (0,0) except two (1,0) rows and one (0,1) ⇒ C ≈
    diag(2/n, 1/n) — distinct eigenvalues so the deterministic start
    vector is not an eigenvector (C ∝ I would orthogonalize the
    deflated iterate by symmetry, a different failure)."""
    from spacex_data_engineering_pipeline_spark.operators.pca import (
        fit_pca_from_moments,
    )

    n = 10_000_000_000
    rows = [
        {"i": 0, "j": 0, "m": n},
        {"i": 1, "j": 0, "m": 2},
        {"i": 2, "j": 0, "m": 1},
        {"i": 1, "j": 1, "m": 2},
        {"i": 2, "j": 2, "m": 1},
        {"i": 1, "j": 2, "m": 0},
    ]
    model = fit_pca_from_moments(rows, n_components=2, n_iter=12)
    assert 0 < model.eigvals[0] < 1e-9  # below the old absolute floor
    assert model.eigvals[1] > 0
    # proportionate: the two eigenvalues are within ~2× of each other
    assert model.eigvals[1] > 0.4 * model.eigvals[0]


def test_pca_whiten_unit_variance(spark, sf_dir):
    """Whitened components have unit variance BY CONSTRUCTION
    (pc_c scaled by its own fitted std): var(wpc1) ≈ 1 up to the
    residual of the power-iteration eigenvalue estimate."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    model = fit_pca(emb, "embedding", n_components=2, n_iter=12)
    proj = pca_project(emb, "vec_id", "embedding", model, decimals=9,
                       whiten=True)
    stats = proj.agg(
        F.avg("wpc1").alias("mu"),
        F.avg(F.col("wpc1") * F.col("wpc1")).alias("m2"),
    ).first()
    var = stats["m2"] - stats["mu"] ** 2
    assert math.isclose(var, 1.0, rel_tol=1e-3), var


def test_moment_additivity_incremental_fit(spark, sf_dir):
    """moments(A ∪ B) = moments(A) + moments(B) exactly for disjoint
    row sets (order-free int64 sums), under hostile repartitioning —
    so the incremental refit model is bit-identical to from-scratch."""
    from spacex_data_engineering_pipeline_spark.operators.linalg import (
        quantized_moments,
    )
    from spacex_data_engineering_pipeline_spark.operators.pca import (
        fit_pca_from_moments,
        merge_moments,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    a = emb.filter(F.col("vec_id") % 3 == 0).repartition(7)
    b = emb.filter(F.col("vec_id") % 3 != 0).repartition(3)
    merged = {
        (r["i"], r["j"]): int(r["m"])
        for r in merge_moments(
            quantized_moments(a, "embedding"), quantized_moments(b, "embedding")
        ).collect()
    }
    full = {
        (r["i"], r["j"]): int(r["m"])
        for r in quantized_moments(emb, "embedding").collect()
    }
    assert merged == full
    # identical moments ⇒ identical model: the fit is a pure function
    # of the moment rows (bit-level identity is additionally graded by
    # the embedding_pca_incremental oracle)
    rows = [{"i": i, "j": j, "m": m} for (i, j), m in full.items()]
    m_merged = fit_pca_from_moments(rows, 2, 12)
    m_full = fit_pca_from_moments(rows, 2, 12)
    assert m_merged.eigvals == m_full.eigvals
